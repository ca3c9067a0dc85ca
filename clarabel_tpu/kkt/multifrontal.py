"""Device-side numeric kernels for the multifrontal sparse LDLᵀ.

TPU-native numeric counterpart of the reference's QDLDL numeric
factorization (reference: src/qdldl/qdldl.rs:468-700): per-pivot dynamic
regularization with expected signs (:517-527) carries over exactly, but the
scalar up-looking loop is replaced by a *levelized batched multifrontal*
scheme prepared by :mod:`mf_symbolic`:

  - every level of the supernodal assembly tree is a batch of independent
    fronts, grouped into padded-size buckets;
  - fronts initialize from the KKT nonzeros with one flat scatter; child
    update matrices extend-add as P·U·Pᵀ with 0/1 row-selection matrices
    (two batched MXU matmuls + a lane segment-sum per (level, child
    storage) pair — TPU scatters cost ~13 ns/element and dominated the
    factor before this);
  - the partial factorization of a [k, r, r] front batch runs a
    ``lax.scan`` over pivot panels of ≤128 columns (VPU rank-1 updates
    inside the panel) and pushes the trailing Schur update through batched
    matmuls (MXU);
  - the triangular solves run the same level schedule with batched
    ``triangular_solve`` + gather/scatter of right-hand-side segments.

Only the lower triangles of fronts carry valid data throughout; the
padding discipline keeps pad lanes exactly zero (pad pivots regularize to
``delta`` and their L columns stay zero), so padded fronts factor to the
same answers as unpadded ones.

Everything is fixed-shape and jit/vmap-friendly; f64 runs on CPU for the
oracle suite and f32 on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_PANEL = 128
_BLOCK = 32
#: pivot blocks up to this width get their unit-lower inverse precomputed
#: at factor time, turning each triangular sweep of the (latency-bound)
#: solves into one batched MXU matmul.  One factor serves ~4-6 solves per
#: IPM iteration, so trading a little factor work for cheaper solves wins.
_INV_MAX_C = 256


def _unit_lower_inverse(L, stable=False):
    """Inverse of a batch of unit-lower matrices stored as their
    strictly-lower part N (zeros at and above the diagonal).

    Default: N is nilpotent with index ≤ c, so (I+N)⁻¹ = Σ (−N)ʲ factors
    exactly into the Neumann product (I+M)(I+M²)(I+M⁴)··· with M = −N —
    ⌈log₂ c⌉ rounds of batched MXU matmuls where XLA's
    ``triangular_solve`` runs a sequential substitution loop
    (latency-bound at multifrontal block sizes).

    ``stable=True`` keeps the substitution form: on ill-conditioned
    nonsymmetric-cone (exp/pow) Hessian blocks the Neumann product's
    accumulated rounding costs a digit and f32 solves regress from
    Solved to AlmostSolved (measured); symmetric-cone NT scalings have
    bounded conditioning and take the fast form."""
    k, c, _ = L.shape
    eye = jnp.broadcast_to(jnp.eye(c, dtype=L.dtype), (k, c, c))
    if stable:
        return lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True, unit_diagonal=True
        )
    M = -L
    acc = eye + M
    span = 2
    while span < c:
        M = jnp.einsum("kij,kjl->kil", M, M)
        acc = acc + jnp.einsum("kij,kjl->kil", acc, M)
        span *= 2
    return acc


def _diag_factor(D, signs, eps, delta):
    """LDLᵀ of a batch of ``b×b`` diagonal blocks (lower triangles valid).

    Returns (L, d): unit-lower ``L`` with zeros at and above the diagonal
    and the regularized pivots ``d``.  The only sequential loop of the
    whole engine — per-pivot dynamic regularization with expected signs
    mirrors qdldl.rs:517-527: d·sign < eps → d = delta·sign.
    """
    k, b, _ = D.shape
    rows = jnp.arange(b)

    def body(D, t):
        colj = D[:, :, t]                             # [k, b]
        dj = jnp.take(colj, t, axis=1)
        sg = signs[:, t]
        dj = jnp.where(dj * sg < eps, delta * sg, dj)
        below = rows[None, :] > t
        l = jnp.where(below, colj / dj[:, None], 0.0)
        # rank-1 update of later columns: D[:, i, t'] -= l_i · colj[t'];
        # the finished L column rides the scan outputs instead of being
        # blended back into the carry (two fewer [k,b,b] ops per step of
        # the only sequential chain in the engine)
        rowvals = jnp.where(below, colj, 0.0)
        D = D - l[:, :, None] * rowvals[:, None, :]
        return D, (l, dj)

    _, (ls, d) = lax.scan(body, D, jnp.arange(b))
    return jnp.moveaxis(ls, 0, 2), jnp.moveaxis(d, 0, 1)  # L: [k,b,b], d: [k,b]


def _panel_factor(panel, j0, signs, eps, delta, diag_fn=_diag_factor):
    """Factor pivot columns [j0, j0+w) of a front batch in place.

    ``panel``: [k, r, w] — full rows of the w pivot columns; pivot row of
    local column t is global front row j0 + t.  Returns (panel, d): the
    columns now hold unit-lower L entries (zero at and above the pivot
    row) and ``d`` the regularized pivots.

    Blocked so only the ``_BLOCK``-sized diagonal blocks run the
    sequential pivot scan; the rows below each block come from one batched
    ``triangular_solve`` (L21 = A21·L11⁻ᵀ·D⁻¹) and the update of later
    panel columns is one batched matmul (MXU).
    """
    k, r, w = panel.shape
    d_parts = []
    for s0 in range(0, w, _BLOCK):
        s1 = min(s0 + _BLOCK, w)
        b = s1 - s0
        g0, g1 = j0 + s0, j0 + s1
        Ld, d = diag_fn(
            panel[:, g0:g1, s0:s1], signs[:, s0:s1], eps, delta
        )
        below = panel[:, g1:, s0:s1]                  # [k, r-g1, b]
        # L21 stays a real triangular solve: applying the explicit
        # Neumann inverse here costs a digit on ill-conditioned exp/pow
        # Hessian blocks (f32 entropy/sum-of-powers tests regress from
        # Solved to AlmostSolved); substitution is the stable form.
        X = lax.linalg.triangular_solve(
            Ld, below, left_side=False, lower=True,
            transpose_a=True, unit_diagonal=True,
        )
        L21 = X / d[:, None, :]
        Wcol = jnp.concatenate(
            [jnp.zeros((k, g0, b), panel.dtype), Ld, L21], axis=1
        )
        panel = panel.at[:, :, s0:s1].set(Wcol)
        d_parts.append(d)
        if s1 < w:
            # columns t' >= s1: F[:, i, t'] -= Σ_t L[:, i, t]·d_t·L[:, j0+t', t]
            R = Wcol[:, g1 : j0 + w, :]               # [k, w-s1, b]
            panel = panel.at[:, :, s1:].add(
                -jnp.einsum("kib,kjb->kij", Wcol * d[:, None, :], R)
            )
    return panel, jnp.concatenate(d_parts, axis=1)


def partial_ldl(F, c, signs, eps, delta, diag_fn=_diag_factor):
    """Partial LDLᵀ of a batch of fronts.

    ``F``: [k, r, r] with valid data in the lower triangle; the first
    ``c`` rows/cols are the pivot block.  Returns (Lc, d, U, ok):
    Lc [k, r, c] unit-lower panel columns, d [k, c] pivots,
    U [k, r-c, r-c] the Schur complement (lower triangle valid).
    """
    k, r, _ = F.shape
    d_parts = []
    for j0 in range(0, c, _PANEL):
        w = min(_PANEL, c - j0)
        j1 = j0 + w
        panel = F[:, :, j0:j1]
        panel, d = _panel_factor(panel, j0, signs[:, j0:j1], eps, delta,
                                 diag_fn=diag_fn)
        F = F.at[:, :, j0:j1].set(panel)
        d_parts.append(d)
        if j1 < r:
            # trailing update: F[j1:, j1:] -= W D Wᵀ with W = L[j1:, j0:j1]
            W = panel[:, j1:, :]                      # [k, r-j1, w]
            F = F.at[:, j1:, j1:].add(
                -jnp.einsum("kiw,kjw->kij", W * d[:, None, :], W)
            )
    d = jnp.concatenate(d_parts, axis=1) if d_parts else jnp.zeros((k, 0), F.dtype)
    Lc = F[:, :, :c]
    U = F[:, c:, c:]
    ok = jnp.all(jnp.isfinite(d)) & jnp.all(jnp.isfinite(Lc))
    return Lc, d, U, ok


def mf_factor(plan, arrays, Kvals, eps, delta, use_pallas=False,
              stable_inverse=False, finit=None):
    """Numeric factorization.  ``Kvals`` is the canonical lower-triangle
    nonzero vector of K (original frame, the CSC order that was handed to
    :func:`mf_symbolic.analyze`).

    ``use_pallas`` is accepted for signature stability but ignored: the
    experimental Pallas kernel modes ("front" fused factorization,
    "diag" pivot chains) were retired in round 5 — measured numerically
    weaker resp. speed-neutral vs this XLA blocked path (STATUS.md).

    Returns (factors, ok); factors is a pytree consumed by
    :func:`mf_solve`.
    """
    del use_pallas
    diag_fn = _diag_factor
    if finit is None:
        dtype = Kvals.dtype
        # kkt/sparse.build composes the fill-reducing permutation into its
        # assembly maps and drops "kperm_map"; standalone plans (tests,
        # direct analyze() users) still carry canonical-order values
        kp = arrays.get("kperm_map")
        Kp = Kvals if kp is None else Kvals[kp]
        # ONE globally-sorted scatter initializes every front from the KKT
        # nonzeros (maps are destination-sorted and unique: each K entry
        # belongs to exactly one front cell); buckets slice their cells out
        finit = jnp.zeros(plan.total_cells, dtype)
        finit = finit.at[arrays["init_dst_all"]].add(
            Kp[arrays["init_src_all"]],
            indices_are_sorted=True, unique_indices=True,
        )
    else:
        # pre-fused assembly workspace (kkt/sparse.factor_fused): sources
        # already scattered straight into the front cells
        dtype = finit.dtype
    dvec = jnp.ones(plan.W, dtype)
    out = []
    ustore = {}
    pstore = {}
    ok = jnp.asarray(True)
    for li, lvl in enumerate(plan.levels):
        lvl_out = []
        for bi, B in enumerate(lvl):
            rp = B.r_pad
            flat = lax.dynamic_slice(finit, (B.f_off,), (B.k * rp * rp,))
            F = flat.reshape(B.k, rp, rp)
            for (sl, sb, akey) in B.asm:
                # extend-add as P·U·Pᵀ (see mf_symbolic): separable
                # destination indices turn the per-element scatter into
                # two batched MXU matmuls — exact, since each output cell
                # receives at most one U entry per child (0/1 P), and
                # overlapping children still sum in the segment-sum.
                U = jnp.take(ustore[(sl, sb)], arrays[akey + ":clanes"],
                             axis=0)                  # [kc, cup, cup]
                rowpos = arrays[akey + ":rowpos"]     # [kc, cup]
                P = (
                    rowpos[:, None, :]
                    == jnp.arange(rp, dtype=rowpos.dtype)[None, :, None]
                ).astype(dtype)                       # [kc, rp, cup]
                pstore[akey] = P  # reused by every mf_solve on this factor
                upd = jnp.einsum(
                    "krj,ksj->krs", jnp.einsum("kri,kij->krj", P, U), P
                )
                F = F + jax.ops.segment_sum(
                    upd, arrays[akey + ":planes"], num_segments=B.k,
                    indices_are_sorted=True,
                )
            signs = jnp.asarray(arrays[B.key + ":signs"], dtype)
            Lc, d, U, okb = partial_ldl(F, B.c_pad, signs, eps, delta,
                                        diag_fn=diag_fn)
            # store full-symmetric U (only its lower triangle is valid —
            # fronts initialize tril-only) so the P·U·Pᵀ extend-add sees
            # both triangles
            Ut = jnp.tril(U)
            ustore[(li, bi)] = Ut + jnp.swapaxes(jnp.tril(U, -1), 1, 2)
            dvec = lax.dynamic_update_slice(dvec, d.reshape(-1), (B.w_off,))
            if B.c_pad <= _INV_MAX_C:
                Linv = _unit_lower_inverse(
                    Lc[:, : B.c_pad, :], stable=stable_inverse
                )
            else:
                Linv = None
            lvl_out.append((Lc, d, Linv))
            ok = ok & okb
        out.append(lvl_out)
    return {"levels": out, "dvec": dvec, "P": pstore}, ok


def mf_solve(plan, arrays, factors, rhs):
    """Solve K x = rhs with the computed factors (levelized forward /
    diagonal / backward sweeps).  ``rhs``: [N] or [N, r] in the original
    frame — multiple right-hand sides ride the same sweeps (the IPM pairs
    the constant and affine solves this way).

    Works in the bucket-contiguous solve workspace (see mf_symbolic):
    each bucket's pivot block is one dynamic slice of ``x``.  Cross-level
    coupling propagates THROUGH fronts level by level with the factor's
    cached 0/1 selection matrices (P einsum + lane segment-sum) instead
    of per-element scatters/gathers into ancestor slots: update vectors
    extend-add parent-ward on the forward sweep, final values push
    child-ward on the backward sweep — the classic multifrontal solve,
    with the same associativity (exact selection, reordered sums only).
    """
    dtype = rhs.dtype
    single = rhs.ndim == 1
    if single:
        rhs = rhs[:, None]
    r = rhs.shape[1]
    rhs_ext = jnp.concatenate([rhs, jnp.zeros((1, r), dtype)])
    x = rhs_ext[arrays["solve_src"]]              # [W, r]

    def blk(x, B):
        v = lax.dynamic_slice(x, (B.w_off, 0), (B.k * B.c_pad, r))
        return v.reshape(B.k, B.c_pad, r)

    def put(x, B, v):
        return lax.dynamic_update_slice(
            x, v.reshape(B.k * B.c_pad, r), (B.w_off, 0)
        )

    pstore = factors["P"]

    # forward sweep: y = L11⁻¹ (b - incoming); update vector
    # u = L21 y + incoming-below-pivot extends to the parent front
    ustore = {}
    for li, lvl in enumerate(plan.levels):
        for bi, B in enumerate(lvl):
            Lc, _d, Linv = factors["levels"][li][bi]
            v = blk(x, B)
            inc_below = None
            for (sl, sb, akey) in B.asm:
                u_c = jnp.take(ustore[(sl, sb)], arrays[akey + ":clanes"],
                               axis=0)            # [kc, cup, r]
                inc = jax.ops.segment_sum(
                    jnp.einsum("kri,kis->krs", pstore[akey], u_c),
                    arrays[akey + ":planes"], num_segments=B.k,
                    indices_are_sorted=True,
                )                                  # [k, rp, r]
                v = v - inc[:, : B.c_pad]
                ib = inc[:, B.c_pad :]
                inc_below = ib if inc_below is None else inc_below + ib
            if Linv is not None:
                y = jnp.einsum("kij,kjr->kir", Linv, v)
            else:
                y = lax.linalg.triangular_solve(
                    Lc[:, : B.c_pad, :], v, left_side=True, lower=True,
                    unit_diagonal=True,
                )
            x = put(x, B, y)
            if B.u_pad:
                u = jnp.einsum("kuc,kcr->kur", Lc[:, B.c_pad :, :], y)
                if inc_below is not None:
                    u = u + inc_below
                ustore[(li, bi)] = u

    x = x / factors["dvec"][:, None]

    # backward sweep: parents push their full front value vector
    # w = [x_pivot ; x_rows] down; children read their row values from it
    rowvals = {}
    for li in range(len(plan.levels) - 1, -1, -1):
        for bi, B in enumerate(plan.levels[li]):
            Lc, _d, Linv = factors["levels"][li][bi]
            v = blk(x, B)
            rv = rowvals.get((li, bi))
            if B.u_pad and rv is not None:
                v = v - jnp.einsum("kuc,kur->kcr", Lc[:, B.c_pad :, :], rv)
            if Linv is not None:
                xc = jnp.einsum("kji,kjr->kir", Linv, v)
            else:
                xc = lax.linalg.triangular_solve(
                    Lc[:, : B.c_pad, :], v, left_side=True, lower=True,
                    unit_diagonal=True, transpose_a=True,
                )
            x = put(x, B, xc)
            if B.asm:
                if B.u_pad:
                    if rv is None:
                        rv = jnp.zeros((B.k, B.u_pad, r), dtype)
                    w = jnp.concatenate([xc, rv], axis=1)   # [k, rp, r]
                else:
                    w = xc
                for (sl, sb, akey) in B.asm:
                    w_sel = jnp.take(w, arrays[akey + ":planes"], axis=0)
                    P = pstore[akey][:, : w.shape[1], :]
                    vals = jnp.einsum("kri,krs->kis", P, w_sel)
                    csl = arrays[akey + ":clanes"]
                    tgt = rowvals.get((sl, sb))
                    if tgt is None:
                        kc_b = plan.levels[sl][sb].k
                        cup = plan.levels[sl][sb].u_pad
                        tgt = jnp.zeros((kc_b, cup, r), dtype)
                    rowvals[(sl, sb)] = tgt.at[csl].set(vals)

    out = x[arrays["solve_out"]]
    return out[:, 0] if single else out
