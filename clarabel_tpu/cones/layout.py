"""Static cone layout: the trace-time description of the composite cone.

TPU-first inversion of the reference's ``CompositeCone`` object
(reference: src/solver/core/cones/compositecone.rs:11-128): instead of a
heterogeneous list of cone objects dispatched per-cone at run time, we compute
a static *layout* on the host once, permute constraint rows so equal cone
kinds are contiguous, and express every cone operation as a vectorized
segment computation over those contiguous groups.  All fields here are plain
Python/NumPy; the layout is hashable and keys the jit cache.

Group order along the permuted slack vector:
    [ zero | nonnegative | soc | exp | pow | genpow | psd ]
"""

from __future__ import annotations

import numpy as np

from . import api
from .api import ConeSpec

_GROUP_ORDER = (api.ZERO, api.NONNEGATIVE, api.SOC, api.EXP, api.POW, api.GENPOW, api.PSD)


class PSDBucket:
    """All PSD cones sharing one matrix dimension ``n``.

    ``svec`` packing follows the reference convention (column-major upper
    triangle with √2-scaled off-diagonals; src/algebra/dense/types.rs), so
    Frobenius inner products equal svec dot products.
    """

    def __init__(self, n: int, offsets):
        self.n = n
        self.tri = (n * (n + 1)) // 2
        self.count = len(offsets)
        # gather index [count, tri] into the PSD group vector
        self.gather = np.asarray(
            [np.arange(o, o + self.tri) for o in offsets], np.int32
        )
        # svec position p <-> (row I[p], col J[p]) with I <= J
        I, J = [], []
        for col in range(n):
            for row in range(col + 1):
                I.append(row)
                J.append(col)
        self.I = np.asarray(I, np.int32)
        self.J = np.asarray(J, np.int32)
        self.is_diag = self.I == self.J
        # scale factors: mat->svec multiplies off-diag by √2
        self.pack_scale = np.where(self.is_diag, 1.0, np.sqrt(2.0))
        self.unpack_scale = 1.0 / self.pack_scale
        # exact double-float (f32 hi/lo) splits of the scale constants:
        # an f32-rounded 1/√2 injects a MULTIPLICATIVE eps32 error into
        # every off-diagonal svec entry, which near μ→0 exceeds the PSD
        # cone's small eigenvalues and collapses step lengths (measured:
        # skron pair error eps·‖Hs‖ traced to exactly this constant)
        self.unpack_scale_h = self.unpack_scale.astype(np.float32)
        self.unpack_scale_l = (
            self.unpack_scale - self.unpack_scale_h.astype(np.float64)
        ).astype(np.float32)


class ConeLayout:
    """Immutable layout of a composite cone over ``m`` constraint rows."""

    def __init__(self, cones):
        self.cones = tuple(cones)
        for c in self.cones:
            if not isinstance(c, ConeSpec):
                raise TypeError(f"expected ConeSpec, got {type(c)}")

        self.m = sum(c.nvars for c in self.cones)
        self.degree = sum(c.degree for c in self.cones)
        self.is_symmetric = all(c.is_symmetric for c in self.cones)
        # reference: GenPowerCone is the only cone that forbids primal-dual
        # scaling (src/solver/core/cones/mod.rs:57, genpowcone.rs)
        self.allows_primal_dual_scaling = all(
            c.kind != api.GENPOW for c in self.cones
        )

        # ---- row permutation grouping cones by kind -----------------
        # perm[i_internal] = i_user ;  b_internal = b_user[perm]
        offsets = np.cumsum([0] + [c.nvars for c in self.cones])
        by_kind = {k: [] for k in _GROUP_ORDER}
        for ci, c in enumerate(self.cones):
            by_kind[c.kind].append(ci)

        perm_blocks = []
        self.group_slices = {}
        pos = 0
        for kind in _GROUP_ORDER:
            width = 0
            for ci in by_kind[kind]:
                c = self.cones[ci]
                perm_blocks.append(np.arange(offsets[ci], offsets[ci] + c.nvars))
                width += c.nvars
            self.group_slices[kind] = slice(pos, pos + width)
            pos += width
        self.perm = (
            np.concatenate(perm_blocks).astype(np.int32)
            if perm_blocks
            else np.zeros(0, np.int32)
        )
        self.iperm = np.argsort(self.perm).astype(np.int32)

        # convenience group views
        self.n_zero = self.group_slices[api.ZERO].stop - self.group_slices[api.ZERO].start
        self.n_nn = self.group_slices[api.NONNEGATIVE].stop - self.group_slices[api.NONNEGATIVE].start

        # ---- SOC segment metadata -----------------------------------
        soc_dims = [c.dim for c in self.cones if c.kind == api.SOC]
        self.soc_dims = tuple(soc_dims)
        self.num_soc = len(soc_dims)
        self.m_soc = sum(soc_dims)
        if self.num_soc:
            self.soc_seg = np.repeat(
                np.arange(self.num_soc, dtype=np.int32), soc_dims
            )
            heads = np.cumsum([0] + soc_dims[:-1]).astype(np.int32)
            self.soc_head_idx = heads  # positions of each cone's t-component
            head_mask = np.zeros(self.m_soc, bool)
            head_mask[heads] = True
            self.soc_head_mask = head_mask
        else:
            self.soc_seg = np.zeros(0, np.int32)
            self.soc_head_idx = np.zeros(0, np.int32)
            self.soc_head_mask = np.zeros(0, bool)

        # ---- 3-dimensional exponential / power cone metadata --------
        self.num_exp = sum(1 for c in self.cones if c.kind == api.EXP)
        pow_alphas = [c.alpha[0] for c in self.cones if c.kind == api.POW]
        self.num_pow = len(pow_alphas)
        self.pow_alpha = np.asarray(pow_alphas, np.float64)

        # ---- generalized power cone segment metadata ----------------
        gp = [c for c in self.cones if c.kind == api.GENPOW]
        self.genpow_cones = tuple(gp)
        self.num_genpow = len(gp)
        self.m_genpow = sum(c.nvars for c in gp)
        if gp:
            # each genpow cone occupies [alpha-part (dim1) | q-part (dim2)],
            # stored consecutively; segments index cones
            segs, part2, alphas = [], [], []
            for gi, c in enumerate(gp):
                d1, d2 = len(c.alpha), c.dim2
                segs.append(np.full(d1 + d2, gi, np.int32))
                part2.append(np.concatenate([np.zeros(d1, bool), np.ones(d2, bool)]))
                alphas.append(np.asarray(c.alpha + (0.0,) * d2, np.float64))
            self.genpow_seg = np.concatenate(segs)
            self.genpow_is_q = np.concatenate(part2)
            self.genpow_alpha = np.concatenate(alphas)
        else:
            self.genpow_seg = np.zeros(0, np.int32)
            self.genpow_is_q = np.zeros(0, bool)
            self.genpow_alpha = np.zeros(0, np.float64)

        # ---- PSD triangle cone metadata ------------------------------
        # cones are bucketed by matrix dimension n; each bucket batches all
        # its cones into [k, n, n] tensors for vmapped linalg
        self.psd_dims = tuple(c.dim for c in self.cones if c.kind == api.PSD)
        self.num_psd = len(self.psd_dims)
        self.m_psd = sum(api._triangular_number(d) for d in self.psd_dims)
        self.psd_buckets = []  # list of PSDBucket
        if self.num_psd:
            # svec order within the PSD group follows cone order; bucket
            # cones of equal n together with gather indices into the group
            by_n = {}
            off = 0
            for d in self.psd_dims:
                t = api._triangular_number(d)
                by_n.setdefault(d, []).append(off)
                off += t
            for n_mat, offs in sorted(by_n.items()):
                self.psd_buckets.append(PSDBucket(n_mat, offs))

        # per-cone segment ids over the whole (permuted) m-vector, used by
        # equilibration rectification; plus a mask of entries whose cone
        # requires scalar (per-cone-constant) equilibration
        seg_all = np.zeros(self.m, np.int32)
        rect = np.zeros(self.m, bool)
        pos = {k: self.group_slices[k].start for k in _GROUP_ORDER}
        cone_id = 0
        for c in self.cones:
            k, w = c.kind, c.nvars
            seg_all[pos[k] : pos[k] + w] = cone_id
            # reference: NN and Zero cones keep elementwise scaling
            # (nonnegativecone.rs:53-56, zerocone.rs:50-53); all others
            # rectify to the per-cone mean (socone.rs:97-101 etc.)
            if k not in (api.ZERO, api.NONNEGATIVE):
                rect[pos[k] : pos[k] + w] = True
            pos[k] += w
            cone_id += 1
        self.cone_seg = seg_all
        self.rectify_mask = rect
        self.num_cones = len(self.cones)

    # ----------------------------------------------------------------
    def slice_of(self, kind: int) -> slice:
        return self.group_slices[kind]

    def __hash__(self):
        return hash(self.cones)

    def __eq__(self, other):
        return isinstance(other, ConeLayout) and self.cones == other.cones

    def __repr__(self):  # pragma: no cover - cosmetic
        return f"ConeLayout(m={self.m}, cones={list(self.cones)})"
