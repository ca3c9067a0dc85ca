"""Double-float (f32x2) dense LU for ill-conditioned f32 KKT systems.

Why this exists.  Near convergence the quasidefinite KKT matrix has
cond(K) ~ 1/μ² across the split NT weights (measured 5e9 at μ ≈ 2.5e-5 on
the strictly-complementary SDP bench lanes).  Any f32 factorization —
pivoted LU, Jacobi-equilibrated LU (the Jacobi scaling does not reduce
cond here; measured 1.7e10), Schur condensations — applies a solve
operator with backward error ~eps32·‖K‖, so iterative refinement's
contraction factor eps32·cond(K) exceeds ONE and refinement stalls at a
small *residual* but O(1) *forward* error: the computed direction
genuinely exits the cone at α ≈ 0.01 while the f64 direction from the
same iterate steps 0.99 (scripts/debug_sdp_direction.py).  Computing
residuals in double-float (kkt/compensated.py) cannot fix this — the
correction *solve* is what amplifies.

The fix is a factorization whose application error is ~eps_df ≈ 2⁻⁴⁸:
then eps_df·cond ≈ 1e-5 ≪ 1 and one solve already has ~1e-5 forward
accuracy, with the existing compensated refinement converging beyond it.
This module implements:

- ``factor``: right-looking LU with PARTIAL PIVOTING carried entirely in
  hi/lo (double-float) pairs.  Pivoting is required: an unpivoted signed
  LDL (qdldl.rs:517-527 style) was measured with element growth ~1e9 on
  split-scale IPM matrices (Hs entries spanning [μ, 1/μ] interleaved),
  which burns the double-float headroom; partial pivoting bounds |L| ≤ 1.
  An exact power-of-two symmetric pre-scaling (frexp/ldexp, no rounding)
  normalizes the diagonal so pivot selection is meaningful.
- ``solve``: forward/backward substitution in double-float
  (column-oriented axpy sweeps, one ``fori_loop`` step per column — no
  inner dots, so each step is a masked [N, R] vector op).

Everything is batched/vmappable: the column loop is a ``lax.fori_loop``
over static-shape masked updates (iota-comparison masks, dynamic row
swaps).  Cost is ~10x a plain f32 LU in flops, which for the N ≤ ~1k
dense systems this path serves is still latency-bound on TPU.

The reference needs none of this: f64 keeps eps·cond ≈ 1e-16·1e10 ≪ 1
(settings.rs:47-68 tolerances).  This module is what makes the same IPM
reach its f32 preset on TPU hardware at strict complementarity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .compensated import _two_prod, _two_sum


def _df_add(ah, al, bh, bl):
    sh, se = _two_sum(ah, bh)
    return _two_sum(sh, se + al + bl)


def _df_sub(ah, al, bh, bl):
    return _df_add(ah, al, -bh, -bl)


def _df_mul(ah, al, bh, bl):
    ph, pe = _two_prod(ah, bh)
    return _two_sum(ph, pe + ah * bl + al * bh)


def _df_div(nh, nl, dh, dl):
    """Double-float division (n / d), ~eps_df accurate."""
    q1 = nh / dh
    # r = n - q1 * d in double-float
    ph, pe = _two_prod(q1, dh)
    rh, re = _two_sum(nh, -ph)
    r = rh + (re - pe + nl - q1 * dl)
    q2 = r / dh
    return _two_sum(q1, q2)


def _pow2_jacobi(K_hi):
    """Exact power-of-two symmetric scaling s with s·diag·s ~ O(1)."""
    diag = jnp.abs(jnp.diagonal(K_hi, axis1=-2, axis2=-1))
    _, expo = jnp.frexp(jnp.maximum(diag, 1e-30))
    # s = 2^(-expo/2), rounded to an integer power of two (exact scaling)
    half = -(expo // 2)
    return jnp.ldexp(jnp.ones_like(diag), half)


def _swap_rows(M, j, p):
    """Swap rows j and p (traced indices) of [..., N, *] M."""
    rj = jax.lax.dynamic_index_in_dim(M, j, axis=-2, keepdims=False)
    rp = jax.lax.dynamic_index_in_dim(M, p, axis=-2, keepdims=False)
    M = jax.lax.dynamic_update_index_in_dim(M, rj, p, axis=-2)
    M = jax.lax.dynamic_update_index_in_dim(M, rp, j, axis=-2)
    return M


def factor(K_hi, K_lo, settings=None, delta=1e-6):
    """Double-float LU with partial pivoting of K = K_hi + K_lo
    (dense [N, N], UNBATCHED — batch via ``jax.vmap`` like the rest of
    the solver core).

    A zero pivot (possible only on a numerically singular K_reg) is
    replaced by ``delta`` so the factor stays finite; the refinement loop
    then judges the solve.  Returns (factors, ok).
    """
    N = K_hi.shape[-1]
    if K_lo is None:
        K_lo = jnp.zeros_like(K_hi)

    s = _pow2_jacobi(K_hi)
    Ah = K_hi * s[:, None] * s[None, :]  # exact
    Al = K_lo * s[:, None] * s[None, :]  # exact
    idx = jnp.arange(N)
    perm0 = idx

    def body(j, carry):
        Ah, Al, perm = carry
        ch = jax.lax.dynamic_index_in_dim(Ah, j, axis=-1, keepdims=False)
        cl = jax.lax.dynamic_index_in_dim(Al, j, axis=-1, keepdims=False)
        # partial pivot: largest |column| entry among rows >= j
        cand = jnp.where(idx >= j, jnp.abs(ch + cl), -1.0)
        p = jnp.argmax(cand, axis=-1)

        Ah = _swap_rows(Ah, j, p)
        Al = _swap_rows(Al, j, p)
        perm = _swap_rows(perm[:, None], j, p)[:, 0]

        ch = jax.lax.dynamic_index_in_dim(Ah, j, axis=-1, keepdims=False)
        cl = jax.lax.dynamic_index_in_dim(Al, j, axis=-1, keepdims=False)
        dh = jax.lax.dynamic_index_in_dim(ch, j, axis=-1, keepdims=False)
        dl = jax.lax.dynamic_index_in_dim(cl, j, axis=-1, keepdims=False)
        # zero-pivot safeguard (numerically singular K_reg)
        bad = dh == 0.0
        dh = jnp.where(bad, delta, dh)
        dl = jnp.where(bad, 0.0, dl)

        lh, ll = _df_div(ch, cl, dh[..., None], dl[..., None])
        below = (idx > j).astype(Ah.dtype)
        lh = lh * below
        ll = ll * below

        rh = jax.lax.dynamic_index_in_dim(Ah, j, axis=-2, keepdims=False)
        rl = jax.lax.dynamic_index_in_dim(Al, j, axis=-2, keepdims=False)
        # keep only columns > j of the pivot row for the trailing update
        right = (idx > j).astype(Ah.dtype)
        rh_t = rh * right
        rl_t = rl * right

        uh, ue = _two_prod(lh[..., :, None], rh_t[..., None, :])
        cross = (
            lh[..., :, None] * rl_t[..., None, :]
            + ll[..., :, None] * rh_t[..., None, :]
        )
        Ah, e1 = _two_sum(Ah, -uh)
        Al = Al + (e1 - ue - cross)
        # renormalize the pair: without this |Al| grows across steps and
        # the next step's error-free product (which covers only Ah) leaks
        # plain-f32 error through the cross terms
        Ah, Al = _two_sum(Ah, Al)

        # store the multipliers into column j below the diagonal; rows <= j
        # keep their (final) U entries
        newh = jnp.where(idx > j, lh, ch)
        newl = jnp.where(idx > j, ll, cl)
        Ah = jax.lax.dynamic_update_index_in_dim(Ah, newh, j, axis=-1)
        Al = jax.lax.dynamic_update_index_in_dim(Al, newl, j, axis=-1)
        return Ah, Al, perm

    # unroll: each body is a handful of elementwise [N, N] ops; on TPU a
    # rolled loop pays per-iteration overhead ~100 us that dwarfs the
    # microseconds of VPU work — unrolling fuses blocks of steps into
    # straight-line code (measured the difference as the whole cost of
    # this kernel in the batched-SDP bench)
    Ah, Al, perm = jax.lax.fori_loop(
        0, N, body, (Ah, Al, perm0), unroll=min(N, 128)
    )
    ok = jnp.all(jnp.isfinite(Ah), axis=(-2, -1)) & jnp.all(
        jnp.isfinite(Al), axis=(-2, -1)
    )
    return (Ah, Al, perm, s), ok


def solve(factors, rhs):
    """Solve K x = rhs through the double-float LU.  ``rhs`` is [..., N]
    or [..., N, R]; returns an f32 array of the same shape holding the
    double-float solution rounded once at the end (the caller's
    compensated refinement recovers the sub-eps remainder)."""
    Ah, Al, perm, s = factors
    N = Ah.shape[-1]
    vec = rhs.ndim == Ah.ndim - 1
    if vec:
        rhs = rhs[..., :, None]

    sb = s[..., :, None]
    b = rhs * sb  # exact (power of two)
    # apply the row permutation
    yh = jnp.take(b, perm, axis=-2)
    yl = jnp.zeros_like(yh)
    idx = jnp.arange(N)

    # forward: L y = b_perm (unit lower; multipliers stored below diag)
    def fwd(j, carry):
        yh, yl = carry
        lh = jax.lax.dynamic_index_in_dim(Ah, j, axis=-1, keepdims=False)
        ll = jax.lax.dynamic_index_in_dim(Al, j, axis=-1, keepdims=False)
        below = (idx > j).astype(Ah.dtype)[..., :, None]
        yjh = jax.lax.dynamic_index_in_dim(yh, j, axis=-2, keepdims=True)
        yjl = jax.lax.dynamic_index_in_dim(yl, j, axis=-2, keepdims=True)
        uh, ul = _df_mul(
            lh[..., :, None] * below, ll[..., :, None] * below, yjh, yjl
        )
        return _df_sub(yh, yl, uh, ul)

    yh, yl = jax.lax.fori_loop(0, N, fwd, (yh, yl), unroll=min(N, 128))

    # backward: U x = y (column-oriented, reversed)
    def bwd(t, carry):
        xh, xl = carry
        j = N - 1 - t
        uh_col = jax.lax.dynamic_index_in_dim(Ah, j, axis=-1, keepdims=False)
        ul_col = jax.lax.dynamic_index_in_dim(Al, j, axis=-1, keepdims=False)
        dh = jax.lax.dynamic_index_in_dim(uh_col, j, axis=-1, keepdims=False)
        dl = jax.lax.dynamic_index_in_dim(ul_col, j, axis=-1, keepdims=False)
        yjh = jax.lax.dynamic_index_in_dim(xh, j, axis=-2, keepdims=False)
        yjl = jax.lax.dynamic_index_in_dim(xl, j, axis=-2, keepdims=False)
        xjh, xjl = _df_div(yjh, yjl, dh[..., None], dl[..., None])
        xh = jax.lax.dynamic_update_index_in_dim(xh, xjh, j, axis=-2)
        xl = jax.lax.dynamic_update_index_in_dim(xl, xjl, j, axis=-2)
        above = (idx < j).astype(Ah.dtype)[..., :, None]
        uh_m = uh_col[..., :, None] * above
        ul_m = ul_col[..., :, None] * above
        ph, pl = _df_mul(uh_m, ul_m, xjh[..., None, :], xjl[..., None, :])
        nh, nl = _df_sub(xh, xl, ph, pl)
        # keep row j (just finalized) untouched by the update
        keep = (idx == j).astype(Ah.dtype)[..., :, None]
        xh = nh * (1 - keep) + xh * keep
        xl = nl * (1 - keep) + xl * keep
        return xh, xl

    xh, xl = jax.lax.fori_loop(0, N, bwd, (yh, yl), unroll=min(N, 128))

    out = (xh + xl) * sb  # exact scale-back; one rounding in the sum
    return out[..., :, 0] if vec else out
