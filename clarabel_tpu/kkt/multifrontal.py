"""Device-side numeric kernels for the multifrontal sparse LDLᵀ.

TPU-native numeric counterpart of the reference's QDLDL numeric
factorization (reference: src/qdldl/qdldl.rs:468-700): per-pivot dynamic
regularization with expected signs (:517-527) carries over exactly, but the
scalar up-looking loop is replaced by a *levelized batched multifrontal*
scheme prepared by :mod:`mf_symbolic`:

  - every level of the supernodal assembly tree is a batch of independent
    fronts, grouped into padded-size buckets;
  - fronts initialize from the KKT nonzeros with one flat scatter; child
    update matrices extend-add with one flat scatter per (level, child
    storage) pair;
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

import jax.numpy as jnp
from jax import lax

_PANEL = 128
_BLOCK = 32
#: pivot blocks up to this width get their unit-lower inverse precomputed
#: at factor time, turning each triangular sweep of the (latency-bound)
#: solves into one batched MXU matmul.  One factor serves ~4-6 solves per
#: IPM iteration, so trading a little factor work for cheaper solves wins.
_INV_MAX_C = 256


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
        # rank-1 update of later columns: D[:, i, t'] -= l_i · colj[t']
        rowvals = jnp.where(below, colj, 0.0)
        D = D - l[:, :, None] * rowvals[:, None, :]
        onehot = (rows == t).astype(D.dtype)[None, None, :]
        D = D * (1.0 - onehot) + l[:, :, None] * onehot
        return D, dj

    D, d = lax.scan(body, D, jnp.arange(b))
    return D, jnp.moveaxis(d, 0, 1)                   # d: [k, b]


def _panel_factor(panel, j0, signs, eps, delta):
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
        Ld, d = _diag_factor(
            panel[:, g0:g1, s0:s1], signs[:, s0:s1], eps, delta
        )
        below = panel[:, g1:, s0:s1]                  # [k, r-g1, b]
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


def partial_ldl(F, c, signs, eps, delta):
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
        panel, d = _panel_factor(panel, j0, signs[:, j0:j1], eps, delta)
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


def mf_factor(plan, arrays, Kvals, eps, delta, use_pallas=False):
    """Numeric factorization.  ``Kvals`` is the canonical lower-triangle
    nonzero vector of K (original frame, the CSC order that was handed to
    :func:`mf_symbolic.analyze`).

    With ``use_pallas`` (TPU f32), buckets within the Pallas gate run the
    fused :func:`pallas_front.front_partial_ldl` kernel — one dispatch per
    bucket instead of the ~5-op-per-panel XLA chain.

    Returns (factors, ok); factors is a pytree consumed by
    :func:`mf_solve`.
    """
    if use_pallas:
        from . import pallas_front
    dtype = Kvals.dtype
    # kkt/sparse.build composes the fill-reducing permutation into its
    # assembly maps and drops "kperm_map"; standalone plans (tests, direct
    # analyze() users) still carry canonical-order values
    kp = arrays.get("kperm_map")
    Kp = Kvals if kp is None else Kvals[kp]
    dvec = jnp.ones(plan.W, dtype)
    # ONE globally-sorted scatter initializes every front from the KKT
    # nonzeros (maps are destination-sorted and unique: each K entry
    # belongs to exactly one front cell); buckets slice their cells out
    finit = jnp.zeros(plan.total_cells, dtype)
    finit = finit.at[arrays["init_dst_all"]].add(
        Kp[arrays["init_src_all"]],
        indices_are_sorted=True, unique_indices=True,
    )
    out = []
    ustore = {}
    ok = jnp.asarray(True)
    for li, lvl in enumerate(plan.levels):
        lvl_out = []
        for bi, B in enumerate(lvl):
            rp = B.r_pad
            flat = lax.dynamic_slice(finit, (B.f_off,), (B.k * rp * rp,))
            for (sl, sb, akey) in B.asm:
                U = ustore[(sl, sb)].reshape(-1)
                flat = flat.at[arrays[akey + ":dst"]].add(
                    U[arrays[akey + ":src"]], indices_are_sorted=True,
                )
            F = flat.reshape(B.k, rp, rp)
            signs = jnp.asarray(arrays[B.key + ":signs"], dtype)
            if use_pallas and pallas_front.supported(B.c_pad, rp, dtype):
                Fo, d = pallas_front.front_partial_ldl(
                    F, signs, B.c_pad, float(eps), float(delta)
                )
                Lc, U = Fo[:, :, : B.c_pad], Fo[:, B.c_pad :, B.c_pad :]
                okb = jnp.all(jnp.isfinite(Fo))
            else:
                Lc, d, U, okb = partial_ldl(F, B.c_pad, signs, eps, delta)
            ustore[(li, bi)] = U
            dvec = lax.dynamic_update_slice(dvec, d.reshape(-1), (B.w_off,))
            if B.c_pad <= _INV_MAX_C:
                eye = jnp.broadcast_to(
                    jnp.eye(B.c_pad, dtype=dtype), (B.k, B.c_pad, B.c_pad)
                )
                Linv = lax.linalg.triangular_solve(
                    Lc[:, : B.c_pad, :], eye, left_side=True, lower=True,
                    unit_diagonal=True,
                )
            else:
                Linv = None
            lvl_out.append((Lc, d, Linv))
            ok = ok & okb
        out.append(lvl_out)
    return {"levels": out, "dvec": dvec}, ok


def mf_solve(plan, arrays, factors, rhs):
    """Solve K x = rhs with the computed factors (levelized forward /
    diagonal / backward sweeps).  ``rhs``: [N] or [N, r] in the original
    frame — multiple right-hand sides ride the same sweeps (the IPM pairs
    the constant and affine solves this way).

    Works in the bucket-contiguous solve workspace (see mf_symbolic):
    each bucket's pivot block is one dynamic slice of ``x``; only the
    cross-level update-row contributions gather/scatter.
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

    for li, lvl in enumerate(plan.levels):
        for bi, B in enumerate(lvl):
            Lc, _d, Linv = factors["levels"][li][bi]
            L11 = Lc[:, : B.c_pad, :]
            if Linv is not None:
                y = jnp.einsum("kij,kjr->kir", Linv, blk(x, B))
            else:
                y = lax.linalg.triangular_solve(
                    L11, blk(x, B), left_side=True, lower=True,
                    unit_diagonal=True,
                )
            x = put(x, B, y)
            if B.u_pad:
                L21 = Lc[:, B.c_pad :, :]
                x = x.at[arrays[B.key + ":rows_w"]].add(
                    -jnp.einsum("kuc,kcr->kur", L21, y)
                )

    x = x / factors["dvec"][:, None]

    for li in range(len(plan.levels) - 1, -1, -1):
        for bi, B in enumerate(plan.levels[li]):
            Lc, _d, Linv = factors["levels"][li][bi]
            L11 = Lc[:, : B.c_pad, :]
            v = blk(x, B)
            if B.u_pad:
                L21 = Lc[:, B.c_pad :, :]
                v = v - jnp.einsum(
                    "kuc,kur->kcr", L21, x[arrays[B.key + ":rows_w"]]
                )
            if Linv is not None:
                xc = jnp.einsum("kji,kjr->kir", Linv, v)
            else:
                xc = lax.linalg.triangular_solve(
                    L11, v, left_side=True, lower=True,
                    unit_diagonal=True, transpose_a=True,
                )
            x = put(x, B, xc)

    out = x[arrays["solve_out"]]
    return out[:, 0] if single else out
