"""Sparse KKT engine: pattern assembly maps + multifrontal factor/solve.

TPU-native counterpart of the reference's sparse KKT assembly and data maps
(reference: src/solver/core/kktsolvers/direct/quasidef/kkt_assembly.rs:20-183,
datamaps.rs): the quasidefinite matrix

    K = [ P   A^T ]
        [ A  -Hs  ]

is kept as its lower-triangle nonzero vector ``Kvals`` in canonical CSC
order.  The host (this module + :mod:`mf_symbolic`) runs once at setup and
produces flat scatter maps from each data source (tril(P) entries, A
entries, Hs block entries in the canonical order of
``cone_ops.hs_lower_coords``, and the full diagonal for static
regularization) into ``Kvals`` slots, plus the multifrontal factorization
plan.  Per IPM iteration the device re-assembles ``Kvals`` with three
scatter-adds and refactors with :func:`multifrontal.mf_factor` — the exact
analog of the reference's "write -Hs blocks, regularize, refactor" update
(directldlkktsolver.rs:134-158, 217-264) with memory O(nnz(L)) instead of
O((n+m)^2).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..cones import ops as cone_ops
from . import mf_symbolic, multifrontal


#: SOC cones above this dimension use the rank-2 sparse expansion
#: (reference: socone.rs:46 SOC_NO_EXPANSION_MAX_SIZE = 4)
SOC_NO_EXPANSION_MAX_SIZE = 4

#: f32 keeps small cones dense: a dense d×d Hs block costs only
#: d(d+1)/2 nonzeros — cheap up to a few hundred and numerically
#: identical to the dense backends' path.  Beyond the threshold the
#: rank-2/3 expansion applies; since round 5 its η²-scaled extension
#: rows are handled by the compensated refinement matvec + K-consistent
#: Δs recovery (kkt/compensated.py, loop.kkt_solve_finish), so expanded
#: problems reach full f32 tolerances (previously the "Known f32 tier"
#: 1e-4 floor).
SOC_NO_EXPANSION_MAX_SIZE_F32 = 256
GENPOW_NO_EXPANSION_MAX_SIZE_F32 = 256


@dataclasses.dataclass
class SparseKKT:
    """Static sparse-KKT structure: shapes, the multifrontal plan, and the
    NumPy index arrays behind the device data pytree."""

    plan: mf_symbolic.MFPlan
    n: int
    m: int
    N: int  # n + m + pdim (sparse-cone expansion rows included)
    nnz: int
    np_arrays: Dict[str, np.ndarray]
    soc_expanded: tuple = ()
    genpow_expanded: bool = False
    #: layout carries nonsymmetric (exp/pow/genpow) cones: their Hessian
    #: blocks are ill-conditioned near the boundary, so the factor keeps
    #: substitution-form L11 inverses (see multifrontal._unit_lower_inverse)
    nonsym: bool = False
    #: static diagonal offsets of the DIA matvec layout (empty = fallback)
    dia_offsets: tuple = ()
    #: scatter-free DIA recipe (zero/NN layouts with DIA-compact P and A):
    #: per K offset, the static segments assembling its lane directly from
    #: P.kd / A.kd / the Hs diagonal — no per-iteration layout scatter
    dia_recipe: tuple = ()

    def device_data(self, dtype, device=None):
        """Stage every index array (plan + assembly maps) onto ``device``
        as one flat dict pytree, staging through NumPy (never the default
        accelerator)."""
        out = {}
        for k, v in {**self.plan.arrays, **self.np_arrays}.items():
            v = np.asarray(v)
            if v.dtype.kind == "f":  # dsigns, per-bucket pivot signs
                v = np.asarray(v, dtype)
            out[k] = jax.device_put(v, device)
        return out


def build(layout, n, P_rows, P_cols, A_rows, A_cols, ordering="auto",
          max_supernode_cols=1024, dtype=None) -> SparseKKT:
    """Symbolic setup.  ``P_rows/P_cols`` are the coordinates of the FULL
    symmetric P in the device COO order; ``A_rows/A_cols`` those of the
    (cone-permuted) A.  reference: kkt_assembly.rs:20-52 (structure),
    qdldl.rs:433-464 + :905-922 (symbolic phase, via mf_symbolic).

    ``dtype`` tunes the sparse-cone expansion thresholds: f32 keeps small
    SOC/genpow cones as dense Hs blocks (see the *_F32 constants)."""
    m = layout.m

    # sparse-cone low-rank expansions: big SOCs get the rank-2 form,
    # genpow cones the rank-3 form (the reference always expands genpow;
    # genpowcone.rs:165-167 Hs_is_diagonal = true).  In f32, small cones
    # stay dense for accuracy (reference is f64-only and never faces this).
    is_f32 = dtype is not None and np.dtype(dtype) == np.float32
    soc_max = SOC_NO_EXPANSION_MAX_SIZE_F32 if is_f32 else SOC_NO_EXPANSION_MAX_SIZE
    soc_expanded = tuple(d > soc_max for d in layout.soc_dims)
    genpow_expanded = layout.num_genpow > 0 and not (
        is_f32
        and all(
            c.nvars <= GENPOW_NO_EXPANSION_MAX_SIZE_F32
            for c in layout.genpow_cones
        )
    )

    hs_r, hs_c = cone_ops.hs_lower_coords(layout, soc_expanded, genpow_expanded)
    exp_r, exp_c, ext_signs = cone_ops.expansion_coords(
        layout, soc_expanded, genpow_expanded
    )
    pdim = ext_signs.shape[0]
    N = n + m + pdim

    P_tril_sel = np.where(P_rows >= P_cols)[0].astype(np.int32)
    diag = np.arange(N, dtype=np.int64)

    groups_r = [P_rows[P_tril_sel], A_rows + n, hs_r + n, exp_r + n, diag]
    groups_c = [P_cols[P_tril_sel], A_cols, hs_c + n, exp_c + n, diag]
    lens = [len(g) for g in groups_r]
    all_r = np.concatenate(groups_r).astype(np.int64)
    all_c = np.concatenate(groups_c).astype(np.int64)
    if np.any(all_r < all_c):
        raise ValueError("internal error: upper-triangle KKT contribution")

    # canonical CSC order: sort by (col, row)
    key = all_c * N + all_r
    uniq, inverse = np.unique(key, return_inverse=True)
    nnz = uniq.shape[0]
    K_rows = (uniq % N).astype(np.int32)
    K_cols = (uniq // N).astype(np.int32)

    off = np.cumsum([0] + lens)
    map_P = inverse[off[0] : off[1]].astype(np.int32)
    map_A = inverse[off[1] : off[2]].astype(np.int32)
    map_hs = inverse[off[2] : off[3]].astype(np.int32)
    map_exp = inverse[off[3] : off[4]].astype(np.int32)
    map_diag = inverse[off[4] : off[5]].astype(np.int32)

    strict_sel = np.where(K_rows != K_cols)[0].astype(np.int32)

    # lower-triangle CSC pattern for the symbolic engine (values unused)
    counts = np.bincount(K_cols, minlength=N)
    indptr = np.zeros(N + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    K_low = sp.csc_matrix(
        (np.ones(nnz), K_rows.astype(np.int64), indptr), shape=(N, N)
    )

    # expected pivot signs: +1 variables, -1 constraints, per-expansion
    # extras (directldlkktsolver.rs:392-405, datamaps.rs Dsigns)
    dsigns = np.concatenate([np.ones(n), -np.ones(m), ext_signs])

    plan = mf_symbolic.analyze(
        K_low, dsigns, ordering=ordering, max_supernode_cols=max_supernode_cols
    )

    # Assemble Kvals directly in the factor's permuted CSC order: composing
    # the fill-reducing permutation into the assembly maps here removes the
    # per-refactor device gather Kvals[kperm_map] (~2 ms at nnz ~ 1e5 —
    # TPU index ops are latency-bound, not bandwidth-bound).
    kperm = plan.arrays.pop("kperm_map").astype(np.int64)
    inv_kperm = np.empty_like(kperm)
    inv_kperm[kperm] = np.arange(nnz, dtype=np.int64)
    map_P = inv_kperm[map_P].astype(np.int32)
    map_A = inv_kperm[map_A].astype(np.int32)
    map_hs = inv_kperm[map_hs].astype(np.int32)
    map_exp = inv_kperm[map_exp].astype(np.int32)
    map_diag = inv_kperm[map_diag].astype(np.int32)
    K_rows = K_rows[kperm]
    K_cols = K_cols[kperm]
    # column-sorted strict-lower selection: the fallback matvec's transpose
    # segment-sum needs sorted segment ids, and the permuted value order no
    # longer sorts by column
    strict_sel = np.where(K_rows != K_cols)[0].astype(np.int64)
    strict_sel = strict_sel[
        np.argsort(K_cols[strict_sel], kind="stable")
    ].astype(np.int32)

    # row-sorted view of the nonzeros so the symmetric matvec's first
    # segment-sum runs with sorted segment ids (canonical CSC order is
    # (col, row)-sorted, which already sorts the transpose-part ids)
    row_order = np.argsort(K_rows, kind="stable").astype(np.int32)

    np_arrays = {
        "kkt:map_P": map_P,
        "kkt:map_A": map_A,
        "kkt:map_hs": map_hs,
        "kkt:map_exp": map_exp,
        "kkt:map_diag": map_diag,
        "kkt:P_tril_sel": P_tril_sel,
        "kkt:K_rows": K_rows,
        "kkt:K_cols": K_cols,
        "kkt:strict_sel": strict_sel,
        "kkt:dsigns": dsigns,
        "kkt:row_order": row_order,
        "kkt:rows_sorted": K_rows[row_order],
        "kkt:cols_of_sorted": K_cols[row_order],
    }

    # DIA (diagonal-offset) layout of the FULL symmetric pattern for the
    # refinement matvec.  TPU index ops (gather/scatter/segment-sum) cost
    # ~13 ns/element regardless of direction, so the win is to pay ONE
    # scatter per KKT assembly to lay K out by diagonal offset — after
    # that every matvec is pure vector math: y += K_dia[o] * shift(x, o)
    # with *static* shifts (banded/MPC patterns have a handful of
    # offsets).  Patterns with many distinct offsets (scattered or dense
    # rows) keep the segment-sum fallback.
    fr = np.concatenate([K_rows, K_cols[strict_sel]]).astype(np.int64)
    fc = np.concatenate([K_cols, K_rows[strict_sel]]).astype(np.int64)
    fslot = np.concatenate(
        [np.arange(nnz, dtype=np.int64), strict_sel.astype(np.int64)]
    )
    uoff = np.unique(fc - fr)
    dia_offsets: tuple = ()
    if uoff.size and uoff.size <= 96 and uoff.size * N <= max(
        8 * fr.size, 1 << 20
    ):
        oidx = np.searchsorted(uoff, fc - fr)
        dia_pos = oidx * N + fr
        order = np.argsort(dia_pos)
        np_arrays["kkt:dia_pos"] = dia_pos[order].astype(np.int32)
        np_arrays["kkt:dia_src"] = fslot[order].astype(np.int32)
        dia_offsets = tuple(int(o) for o in uoff)

    # scatter-free DIA recipe: for zero/NN layouts, K's full-symmetric
    # DIA lanes decompose exactly into P's and A's (already materialized
    # by COOMat.predia) plus the Hs diagonal — the per-iteration layout
    # scatter (~13 ns/element over nnz+strict entries) disappears.
    dia_recipe: tuple = ()
    only_zero_nn = (
        layout.m_soc == 0 and layout.num_exp == 0 and layout.num_pow == 0
        and layout.num_genpow == 0 and layout.num_psd == 0
    )
    if dia_offsets and pdim == 0 and only_zero_nn:
        dia_recipe = _build_dia_recipe(
            dia_offsets, n, m, N, layout,
            P_rows, P_cols, A_rows, A_cols,
        )

    if dia_recipe:
        # fused assembly: with the recipe matvec covering refinement,
        # Kvals is never needed — sources scatter STRAIGHT into the
        # multifrontal assembly workspace (map composition through the
        # per-slot front cell), merging the Kvals scatter, the
        # regularization scatter and the front-init gather+scatter into
        # one scatter-add.
        cell_of_slot = np.empty(nnz, np.int64)
        cell_of_slot[plan.arrays["init_src_all"]] = plan.arrays[
            "init_dst_all"
        ]
        src_slots = np.concatenate([map_P, map_A, map_hs, map_exp])
        np_arrays["fuse:cells"] = np.concatenate(
            [cell_of_slot[src_slots], cell_of_slot[map_diag]]
        ).astype(np.int32)
        # |diag K| contributions for the static-regularization magnitude:
        # indices into the concatenated source-value vector (each diag
        # slot receives at most one contribution, so max over entries
        # equals max over summed slots)
        nP = P_tril_sel.size
        nA = A_rows.size
        pdiag = np.where(
            P_rows[P_tril_sel] == P_cols[P_tril_sel]
        )[0]
        hsdiag = np.where(hs_r == hs_c)[0] + nP + nA
        expdiag = np.where(exp_r == exp_c)[0] + nP + nA + hs_r.size
        np_arrays["fuse:absdiag_sel"] = np.concatenate(
            [pdiag, hsdiag, expdiag]
        ).astype(np.int32)

    return SparseKKT(
        plan=plan, n=n, m=m, N=N, nnz=nnz, np_arrays=np_arrays,
        soc_expanded=soc_expanded, genpow_expanded=genpow_expanded,
        dia_offsets=dia_offsets,
        nonsym=bool(layout.num_exp or layout.num_pow or layout.num_genpow),
        dia_recipe=dia_recipe,
    )


def _build_dia_recipe(dia_offsets, n, m, N, layout,
                      P_rows, P_cols, A_rows, A_cols):
    """Host-side: per K offset, the static segments assembling its lane
    from P.kd / A.kd / -hs_diag.  Returns () when P or A is not
    DIA-compact or the derived offset set disagrees with the K pattern's
    (then the scatter fallback stays)."""
    from ..algebra.coo import dia_metadata

    P_offs, _ = dia_metadata(P_rows, P_cols, (n, n))
    A_offs, _ = dia_metadata(A_rows, A_cols, (m, n))
    if P_offs is None or A_offs is None:
        return ()
    derived = set(P_offs)
    for oA in A_offs:
        derived.add(oA - n)   # A block: K row n+i, col i+oA
        derived.add(n - oA)   # mirrored Aᵀ block
    derived.add(0)            # Hs diagonal (may be absent if m == n_zero)
    if not set(dia_offsets) <= derived:
        return ()

    recipe = []
    for o in dia_offsets:
        segs = []
        if o in P_offs:
            # K rows [0, n): P's own lane
            segs.append(("P", P_offs.index(o), 0, n, 0))
        if (o + n) in A_offs:
            # lower A block: K rows [n, n+m)
            segs.append(("Alow", A_offs.index(o + n), n, m, 0))
        if (n - o) in A_offs:
            # mirrored block: K row j = i + oA carries A.kd[oA][i];
            # valid while 0 <= j < n and 0 <= i < m
            oA = n - o
            j0 = max(0, oA)
            j1 = min(n, oA + m)
            if j1 > j0:
                segs.append(("Amir", A_offs.index(oA), j0, j1 - j0,
                             j0 - oA))
        if o == 0 and layout.n_nn:
            # Hs diagonal: NN rows are the contiguous tail after the
            # zero-cone block (row order groups cones by kind)
            segs.append(("Hs", 0, n + layout.n_zero, layout.n_nn, 0))
        recipe.append((int(o), tuple(segs)))
    return tuple(recipe)


# ----------------------------------------------------------------------
# device-side (jit-traced) operations
# ----------------------------------------------------------------------

def assemble(ctx: SparseKKT, data, P, A, hs_vals, exp_vals, settings):
    """(K_true_vals, K_reg_vals) in canonical CSC order.  ``P``/``A`` are
    COOMat (P full-symmetric) in the exact COO order given to
    :func:`build`; ``exp_vals`` the sparse-cone expansion entries.
    Static regularization by expected sign mirrors
    directldlkktsolver.rs:217-264.

    All sources assemble with ONE fused scatter-add: fewer dispatches, and
    it sidesteps an XLA TPU algebraic-simplifier crash on tiny scatters
    inside the solver loop's cond (observed with a 4-entry genpow Hs-diag
    map: "A cycle is detected while visiting instruction ... scatter-add").
    """
    dtype = P.data.dtype
    vals = [P.data[data["kkt:P_tril_sel"]], A.data]
    idx = [data["kkt:map_P"], data["kkt:map_A"]]
    if hs_vals.shape[0]:
        vals.append(-hs_vals)
        idx.append(data["kkt:map_hs"])
    if exp_vals.shape[0]:
        # expansion entries carry their own signs (datamaps.rs update fns)
        vals.append(exp_vals)
        idx.append(data["kkt:map_exp"])
    K = jnp.zeros(ctx.nnz, dtype)
    K = K.at[jnp.concatenate(idx)].add(jnp.concatenate(vals))

    if settings.static_regularization_enable:
        dvals = K[data["kkt:map_diag"]]
        eps = (
            settings.static_regularization_constant
            + settings.static_regularization_proportional
            * jnp.max(jnp.abs(dvals), initial=0.0)
        )
        K_reg = K.at[data["kkt:map_diag"]].add(data["kkt:dsigns"] * eps)
    else:
        K_reg = K
    return K, K_reg


def sym_matvec(ctx: SparseKKT, data, Kvals, v):
    """y = K v with K given by its lower-triangle values (for iterative
    refinement against the unregularized K; directldlkktsolver.rs:266-321).
    ``v`` may be [N] or [N, r] (multi-RHS refinement).

    Two segment sums with sorted segment ids: the lower-triangle term
    through a row-sorted gather of the nonzeros, the transpose term
    through the column-sorted strict selection.  Prefer :func:`make_matvec`
    where one Kvals vector serves several products — it pays one scatter to
    reach the DIA layout and then each product is index-op-free."""
    rows, cols = data["kkt:K_rows"], data["kkt:K_cols"]
    ro = data["kkt:row_order"]
    Kr = Kvals[ro]
    Krv = Kr if v.ndim == 1 else Kr[:, None]
    y = jax.ops.segment_sum(
        Krv * v[data["kkt:cols_of_sorted"]], data["kkt:rows_sorted"],
        num_segments=ctx.N, indices_are_sorted=True,
    )
    ssel = data["kkt:strict_sel"]
    Ks = Kvals[ssel] if v.ndim == 1 else Kvals[ssel][:, None]
    y = y + jax.ops.segment_sum(
        Ks * v[rows[ssel]], cols[ssel], num_segments=ctx.N,
        indices_are_sorted=True,
    )
    return y


def sym_matvec_df(ctx: SparseKKT, data, Kvals, v, v_lo=None):
    """Compensated y = K (v + v_lo) returning a double-float (hi, lo).

    The expanded-cone extension rows are long cancelling sums of
    η-scaled entries (datamaps.rs:199-221 semantics): a plain f32
    segment sum floors their residual at eps·Σ|K||v| per row, which is
    the "Known f32 tier" accuracy wall for rank-2/3 expansions.  Exact
    products + limb-split segment sums (kkt/compensated.py:seg_sum_df)
    remove that wall for the refinement residual.
    """
    from . import compensated as dfc

    if v.ndim == 2:
        f = lambda vc, vlc: sym_matvec_df(ctx, data, Kvals, vc, vlc)
        vl = jnp.zeros_like(v) if v_lo is None else v_lo
        return jax.vmap(f, in_axes=(1, 1), out_axes=1)(v, vl)

    rows, cols = data["kkt:K_rows"], data["kkt:K_cols"]
    ro = data["kkt:row_order"]
    ssel = data["kkt:strict_sel"]

    p1, e1 = dfc._two_prod(Kvals[ro], v[data["kkt:cols_of_sorted"]])
    if v_lo is not None:
        e1 = e1 + Kvals[ro] * v_lo[data["kkt:cols_of_sorted"]]
    h1, l1 = dfc.seg_sum_df(p1, e1, data["kkt:rows_sorted"], ctx.N)

    p2, e2 = dfc._two_prod(Kvals[ssel], v[rows[ssel]])
    if v_lo is not None:
        e2 = e2 + Kvals[ssel] * v_lo[rows[ssel]]
    h2, l2 = dfc.seg_sum_df(p2, e2, cols[ssel], ctx.N)

    hi, err = dfc._two_sum(h1, h2)
    return hi, err + l1 + l2


def make_matvec(ctx: SparseKKT, data, Kvals):
    """Returns v -> K v for iterative refinement, amortized for several
    products per assembled Kvals (the IPM does ~4 per iteration).

    DIA fast path: ONE sorted scatter lays K out by diagonal offset; each
    product is then Σ_o K_dia[o] ⊙ shift(v, o) with static shifts — no
    gathers, no scatters, no segment sums (TPU index ops run at ~13 ns per
    element; a 1e5-nnz matvec costs ~5 ms through them and ~0.2 ms here).
    Patterns without a compact offset set fall back to the segment path.
    """
    offs = ctx.dia_offsets
    if not offs:
        mv_seg = lambda v: sym_matvec(ctx, data, Kvals, v)
        mv_seg.df = lambda v, v_lo=None: sym_matvec_df(
            ctx, data, Kvals, v, v_lo
        )
        return mv_seg

    O = len(offs)
    N = ctx.N
    Kd = (
        jnp.zeros(O * N, Kvals.dtype)
        .at[data["kkt:dia_pos"]]
        .set(
            Kvals[data["kkt:dia_src"]],
            indices_are_sorted=True, unique_indices=True,
        )
        .reshape(O, N)
    )
    return _dia_mv(Kd, offs, N)


def _dia_mv(Kd, offs, N):
    """DIA product closure with a compensated ``.df`` variant attached.

    The offset loop is a fixed small accumulation chain, so
    TwoProd/TwoSum (kkt/compensated.py) carry its rounding exactly —
    the ``.df`` form is what iterative refinement evaluates residuals
    with on f32 sparse systems."""
    from . import compensated as dfc

    lo = max(0, -min(offs))
    hi = max(0, max(offs))

    def mv(v):
        single = v.ndim == 1
        if single:
            v = v[:, None]
        vp = jnp.pad(v, ((lo, hi), (0, 0)))
        acc = jnp.zeros_like(v)
        for i, o in enumerate(offs):
            acc = acc + Kd[i][:, None] * jax.lax.dynamic_slice_in_dim(
                vp, lo + o, N, 0
            )
        return acc[:, 0] if single else acc

    def mv_df(v, v_lo=None):
        single = v.ndim == 1
        if single:
            v = v[:, None]
            v_lo = None if v_lo is None else v_lo[:, None]
        vp = jnp.pad(v, ((lo, hi), (0, 0)))
        vlp = None if v_lo is None else jnp.pad(v_lo, ((lo, hi), (0, 0)))
        acc_h = jnp.zeros_like(v)
        acc_l = jnp.zeros_like(v)
        for i, o in enumerate(offs):
            sl = jax.lax.dynamic_slice_in_dim(vp, lo + o, N, 0)
            p, e = dfc._two_prod(Kd[i][:, None], sl)
            if vlp is not None:
                e = e + Kd[i][:, None] * jax.lax.dynamic_slice_in_dim(
                    vlp, lo + o, N, 0
                )
            acc_h, e2 = dfc._two_sum(acc_h, p)
            acc_l = acc_l + e + e2
        if single:
            return acc_h[:, 0], acc_l[:, 0]
        return acc_h, acc_l

    mv.df = mv_df
    return mv


def make_matvec_sources(ctx: SparseKKT, P, A, hs_vals):
    """Scatter-free refinement matvec for zero/NN layouts: K's DIA lanes
    assemble directly from the already-materialized ``P.kd`` / ``A.kd``
    and the Hs diagonal by the static :func:`_build_dia_recipe` segments —
    pure pads and adds, no per-iteration layout scatter (which costs
    ~13 ns/element over nnz+strict entries)."""
    offs = ctx.dia_offsets
    N = ctx.N
    dtype = hs_vals.dtype if hs_vals.size else P.data.dtype

    lanes = []
    for o, segs in ctx.dia_recipe:
        lane = jnp.zeros(N, dtype)
        for spec in segs:
            kind, lane_idx, row0, length = spec[0], spec[1], spec[2], spec[3]
            if kind == "P":
                seg = P.kd[lane_idx]
            elif kind == "Alow":
                seg = A.kd[lane_idx]
            elif kind == "Amir":
                src0 = spec[4]
                seg = A.kd[lane_idx][src0 : src0 + length]
            else:  # Hs diagonal (negated block of K)
                seg = -hs_vals
            lane = lane + jnp.pad(seg, (row0, N - row0 - seg.shape[0]))
        lanes.append(lane)
    Kd = jnp.stack(lanes)
    return _dia_mv(Kd, offs, N)


def factor_fused(ctx: SparseKKT, data, P, A, hs_vals, exp_vals, settings,
                 use_pallas=False):
    """Fused assembly + numeric refactorization for layouts with a DIA
    recipe: source values scatter straight into the multifrontal assembly
    workspace ("fuse:cells" composes the Kvals slot and front-cell maps),
    with static regularization folded into the same scatter-add — the
    Kvals vector is never materialized (the recipe matvec serves
    refinement).  Semantics identical to assemble()+factor()."""
    dtype = P.data.dtype
    vals = [P.data[data["kkt:P_tril_sel"]], A.data]
    if hs_vals.shape[0]:
        vals.append(-hs_vals)
    if exp_vals.shape[0]:
        vals.append(exp_vals)
    vals = jnp.concatenate(vals)
    if settings.static_regularization_enable:
        dcontrib = vals[data["fuse:absdiag_sel"]]
        eps = (
            settings.static_regularization_constant
            + settings.static_regularization_proportional
            * jnp.max(jnp.abs(dcontrib), initial=0.0)
        )
        reg = data["kkt:dsigns"] * eps
    else:
        reg = jnp.zeros(ctx.N, dtype)
    finit = jnp.zeros(ctx.plan.total_cells, dtype)
    finit = finit.at[data["fuse:cells"]].add(jnp.concatenate([vals, reg]))
    if settings.dynamic_regularization_enable:
        deps = settings.dynamic_regularization_eps
        delta = settings.dynamic_regularization_delta
    else:
        deps, delta = -float("inf"), 1.0
    return multifrontal.mf_factor(
        ctx.plan, data, None, deps, delta, use_pallas=use_pallas,
        stable_inverse=ctx.nonsym, finit=finit,
    )


def factor(ctx: SparseKKT, data, K_reg_vals, settings, use_pallas=False):
    """Numeric multifrontal refactorization (qdldl.rs:468-700 analog).
    Dynamic per-pivot regularization uses the expected-sign rule
    (qdldl.rs:517-527); disabled -> thresholds that never fire."""
    if settings.dynamic_regularization_enable:
        eps = settings.dynamic_regularization_eps
        delta = settings.dynamic_regularization_delta
    else:
        eps, delta = -float("inf"), 1.0
    return multifrontal.mf_factor(
        ctx.plan, data, K_reg_vals, eps, delta, use_pallas=use_pallas,
        stable_inverse=ctx.nonsym,
    )


def solve(ctx: SparseKKT, data, factors, rhs):
    return multifrontal.mf_solve(ctx.plan, data, factors, rhs)
