"""Chordal decomposition driver: sparsity analysis, the standard ("H")
problem augmentation, solution reversal and PSD completion.

reference: src/solver/chordal/chordal_info.rs, decomp/augment_standard.rs,
decomp/reverse_standard.rs, decomp/psd_completion.rs.

All of this is host-side trace-time work on NumPy data: it rewrites the
problem before the jitted solve and maps the solution back afterwards.
Decomposition replaces each large sparse PSD cone with many small clique
cones — the reference's mechanism for scaling problem dimension, and the
natural axis for sharding cliques across TPU devices.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..cones import api
from ..cones.api import ConeSpec
from .merge import merge_cliques
from .sntree import SuperNodeTree
from .symbolic import find_graph


def _tri(k: int) -> int:
    return (k * (k + 1)) // 2


def _tri_index(i: int, j: int) -> int:
    """svec index of upper-triangle coordinate (i, j), i <= j."""
    return j * (j + 1) // 2 + i


@dataclasses.dataclass
class SparsityPattern:
    """Clique data for one decomposable PSD cone
    (reference: sparsity_pattern.rs)."""

    sntree: SuperNodeTree
    ordering: np.ndarray  # permuted vertex -> original vertex
    orig_index: int

    @classmethod
    def new(cls, L_cols, ordering, orig_index, merge_method):
        sntree = SuperNodeTree(L_cols)
        if sntree.n_cliques > 1:
            merge_cliques(sntree, merge_method)
        ordering = sntree.reorder_snode_consecutively(ordering)
        sntree.calculate_block_dimensions()
        return cls(sntree, ordering, orig_index)


class ChordalInfo:
    """reference: chordal_info.rs:51-135"""

    def __init__(self, A: np.ndarray, b: np.ndarray, cones: Tuple[ConeSpec, ...],
                 settings):
        self.init_dims = (A.shape[1], A.shape[0])
        self.init_cones = cones
        self.spatterns: List[SparsityPattern] = []
        self.H = None  # standard-transform matrix, set by decomp_augment

        merge_method = settings.chordal_decomposition_merge_method

        # aggregate sparsity across the rows of [A; b]
        nz_mask = (np.abs(A).sum(axis=1) != 0) | (b != 0)

        row = 0
        for coneidx, cone in enumerate(cones):
            w = cone.nvars
            if cone.kind == api.PSD and cone.dim > 1:
                mask = nz_mask[row : row + w].copy()
                n = cone.dim
                # diagonal entries must be structurally present
                for i in range(n):
                    mask[_tri_index(i, i)] = True
                if not mask.all():
                    L_cols, ordering = find_graph(mask, n)
                    sp = SparsityPattern.new(L_cols, ordering, coneidx, merge_method)
                    if sp.sntree.n_cliques > 1:
                        self.spatterns.append(sp)
            row += w

    @property
    def is_decomposed(self) -> bool:
        return bool(self.spatterns)

    # ------------------------------------------------------------------
    # standard augmentation (augment_standard.rs)
    # ------------------------------------------------------------------

    def decomp_augment(self, P, q, A, b, settings):
        """Rewrite (P, q, A, b, cones) with clique cones.

        Standard transform:  A_new = [[A, H], [0, -I]],  b_new = [b; 0],
        with the first m rows becoming equality constraints and each clique
        contributing a small PSD cone on the added variables.
        """
        # (the compact transform arrives with the sparse KKT path; the
        # standard transform is used for either setting and produces
        # identical solutions after reversal)
        H, cones_new = self._find_standard_H_and_cones()
        nH = H.shape[1]
        n, m = A.shape[1], A.shape[0]

        P_new = np.zeros((n + nH, n + nH))
        P_new[:n, :n] = P
        q_new = np.concatenate([q, np.zeros(nH)])
        A_new = np.block(
            [[A, H], [np.zeros((nH, n)), -np.eye(nH)]]
        )
        b_new = np.concatenate([b, np.zeros(nH)])

        self.H = H
        return P_new, q_new, A_new, b_new, tuple(cones_new)

    def _find_standard_H_and_cones(self):
        """reference: augment_standard.rs:63-121"""
        cones = self.init_cones
        n0, m0 = self.init_dims

        cones_new: List[ConeSpec] = [api.ZeroConeT(m0)]
        H_rows: List[int] = []

        patterns = list(self.spatterns)
        pat_idx = 0
        row = 0
        for coneidx, cone in enumerate(cones):
            if pat_idx < len(patterns) and patterns[pat_idx].orig_index == coneidx:
                sp = patterns[pat_idx]
                pat_idx += 1
                sntree = sp.sntree
                for i in range(sntree.n_cliques):
                    clique = sorted(sp.ordering[v] for v in sntree.get_clique(i))
                    for j in range(len(clique)):
                        for k in range(j + 1):
                            H_rows.append(
                                row + _tri_index(clique[k], clique[j])
                            )
                    cones_new.append(api.PSDTriangleConeT(sntree.get_nblk(i)))
            else:
                for i in range(cone.nvars):
                    H_rows.append(row + i)
                cones_new.append(cone)
            row += cone.nvars

        H = np.zeros((m0, len(H_rows)))
        H[np.asarray(H_rows, np.int64), np.arange(len(H_rows))] = 1.0
        return H, cones_new

    # ------------------------------------------------------------------
    # reversal (reverse_standard.rs) + completion (psd_completion.rs)
    # ------------------------------------------------------------------

    def decomp_reverse(self, x, z, s, settings):
        """Map the decomposed solution back to the original cones."""
        n, m = self.init_dims
        x_new = x[:n]
        s_new = self.H @ s[m:]
        z_new = self.H @ z[m:]

        # average the overlapping dual entries (reverse_standard.rs:30-39)
        noverlaps = self.H.sum(axis=1)
        mask = noverlaps > 1
        z_new[mask] /= noverlaps[mask]

        if settings.chordal_decomposition_complete_dual:
            self._psd_completion(z_new)

        return x_new, z_new, s_new

    def _psd_completion(self, z: np.ndarray) -> None:
        """PSD completion of the dual variable (Vandenberghe's chordal-graph
        algorithm; psd_completion.rs:36-133).  In-place on z."""
        row = 0
        ranges = []
        for cone in self.init_cones:
            ranges.append((row, row + cone.nvars))
            row += cone.nvars

        for sp in self.spatterns:
            lo, hi = ranges[sp.orig_index]
            zi = z[lo:hi]
            Z = _svec_to_mat(zi)
            _psd_complete(Z, sp)
            z[lo:hi] = _mat_to_svec(Z)


def _svec_to_mat(x: np.ndarray) -> np.ndarray:
    t = x.shape[0]
    n = int((np.sqrt(8 * t + 1) - 1) / 2)
    M = np.zeros((n, n))
    idx = 0
    isq2 = 1.0 / np.sqrt(2.0)
    for col in range(n):
        for r in range(col + 1):
            if r == col:
                M[r, col] = x[idx]
            else:
                M[r, col] = M[col, r] = x[idx] * isq2
            idx += 1
    return M


def _mat_to_svec(M: np.ndarray) -> np.ndarray:
    n = M.shape[0]
    out = np.zeros(_tri(n))
    idx = 0
    sq2 = np.sqrt(2.0)
    for col in range(n):
        for r in range(col + 1):
            out[idx] = M[r, col] if r == col else M[r, col] * sq2
            idx += 1
    return out


def _psd_complete(Am: np.ndarray, sp: SparsityPattern) -> None:
    """reference: psd_completion.rs:49-133"""
    sntree = sp.sntree
    p = np.asarray(sp.ordering, np.int64)
    ip = np.argsort(p)
    N = Am.shape[0]

    W = Am[np.ix_(p, p)]

    for j in range(sntree.n_cliques - 2, -1, -1):
        nu = sorted(sntree.get_snode(j))
        alpha = sorted(sntree.get_separators(j))
        i_rep = nu[0]
        in_alpha = set(alpha)
        in_nu = set(nu)
        eta = [x for x in range(i_rep + 1, N) if x not in in_alpha and x not in in_nu]
        if not eta or not alpha:
            continue

        Waa = W[np.ix_(alpha, alpha)]
        Wan = W[np.ix_(alpha, nu)]
        Wea = W[np.ix_(eta, alpha)]

        try:
            Y = np.linalg.solve(Waa, Wan)
        except np.linalg.LinAlgError:
            Y = np.linalg.pinv(Waa) @ Wan

        block = Wea @ Y
        W[np.ix_(eta, nu)] = block
        W[np.ix_(nu, eta)] = block.T

    Am[...] = W[np.ix_(ip, ip)]


def try_chordal_info(A, b, cones, settings) -> Optional[ChordalInfo]:
    """reference: problemdata.rs:352-381"""
    if not settings.chordal_decomposition_enable:
        return None
    if not any(c.kind == api.PSD and c.dim > 3 for c in cones):
        return None
    info = ChordalInfo(A, b, cones, settings)
    if not info.is_decomposed:
        return None
    return info
