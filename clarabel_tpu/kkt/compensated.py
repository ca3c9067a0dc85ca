"""Double-float (compensated f32) residuals for iterative refinement.

The f32 KKT solve has forward error O(eps * cond(K)); near convergence
cond(K) ~ 1/mu ~ 1e6 makes that O(0.1) — the step direction drowns in
rounding noise and the IPM stalls just above the f32 tolerance preset.
Classic mixed-precision iterative refinement fixes the forward error if
the residual  r = rhs - K x  is computed in higher-than-working
precision (Moler 1967; Ogita-Rump Dot2).  TPUs have no f64, so the
residual is evaluated in double-float ("f32x2") arithmetic built from
error-free transformations:

- products K_ij * x_j are split exactly into hi+lo via Dekker splitting
  (12-bit halves: their pairwise products are exact in f32),
- the row reduction is a compensated pairwise tree (TwoSum at each
  level, error terms accumulated in a parallel lo-vector).

Everything is full-width vector ops — no scans, no data-dependent
control flow — so it vectorizes over vmap/batch and maps cleanly onto
the TPU VPU.  Cost is ~6x the flops of a plain matvec, negligible next
to the O(N^3) factorization it refines.

The reference never needs this: its LDL runs in f64 where eps*cond is
already below its 1e-8 targets (reference:
src/solver/implementations/default/settings.rs:47-68,
directldlkktsolver.rs:266-321).  This module is what makes the same
algorithm reach its tolerance targets in the TPU's native f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Dekker split constant for f32 (24-bit significand -> 12|12 halves)
_SPLIT_F32 = 4097.0  # 2**12 + 1


def _split(a):
    c = a * _SPLIT_F32
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Error-free product: a*b = p + err exactly (f32)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _two_sum(a, b):
    """Error-free sum: a+b = s + err exactly (Knuth TwoSum)."""
    s = a + b
    z = s - a
    err = (a - (s - z)) + (b - z)
    return s, err


def _df_reduce_last(hi, lo):
    """Compensated pairwise reduction over the last axis.

    Input: value/error pairs [..., n].  Returns ([...], [...]) with the
    sum's rounding errors carried in the lo component.  The level count
    is ceil(log2 n), unrolled at trace time (static shapes).
    """
    while hi.shape[-1] > 1:
        m = hi.shape[-1]
        if m % 2:
            pad = [(0, 0)] * (hi.ndim - 1) + [(0, 1)]
            hi = jnp.pad(hi, pad)
            lo = jnp.pad(lo, pad)
        s, e = _two_sum(hi[..., 0::2], hi[..., 1::2])
        hi = s
        lo = lo[..., 0::2] + lo[..., 1::2] + e
    return hi[..., 0], lo[..., 0]


def df_matmul(A, B):
    """Batched matmul in double-float: A[..., i, l] @ B[..., l, j].

    Returns (hi, lo) with A @ B = hi + lo to ~eps^2 accuracy.  Memory is
    O(batch * i * l * j) for the exact-product tensor — intended for the
    small per-cone matrices of the PSD scaling path, not large dense K.
    """
    p, e = _two_prod(A[..., :, :, None], B[..., None, :, :])
    p = jnp.moveaxis(p, -2, -1)
    e = jnp.moveaxis(e, -2, -1)
    return _df_reduce_last(p, e)


def df_matmul_df(Ah, Al, Bh, Bl):
    """Double-float matmul of double-float operands (hi/lo pairs)."""
    p, e = _two_prod(Ah[..., :, :, None], Bh[..., None, :, :])
    e = e + Ah[..., :, :, None] * Bl[..., None, :, :]
    e = e + Al[..., :, :, None] * Bh[..., None, :, :]
    p = jnp.moveaxis(p, -2, -1)
    e = jnp.moveaxis(e, -2, -1)
    return _df_reduce_last(p, e)


def seg_sum_df(p, e, seg_ids, num_segments):
    """Compensated segment sum: Σ_seg (p + e) to ~2^-34 relative accuracy.

    ``p`` carries the product hi parts, ``e`` their error-free low parts
    (from :func:`_two_prod`).  XLA's segment_sum cannot carry a running
    compensation, so exactness comes from Demmel-Hida limb splitting:
    scale each segment by a power of two (exact), split into 11-bit
    limbs aligned to a common grid — partial sums of ≤ 2^12 such terms
    are exact in f32 — and sum each limb stream independently.  Three
    limbs put the grid floor at ~2^-34 of the segment max, far below
    the f32 refinement targets.  ``seg_ids`` must be sorted.

    Returns (hi, lo) per segment.
    """
    mag = jax.ops.segment_max(
        jnp.abs(p), seg_ids, num_segments=num_segments,
        indices_are_sorted=True,
    )
    mag = jnp.maximum(mag, 1e-30)
    # exact power-of-two segment scale
    _, expo = jnp.frexp(mag)
    s = jnp.ldexp(jnp.ones_like(mag), expo)
    se = s[seg_ids]
    t = p / se  # exact: power-of-two divide, |t| <= 1

    G = 2048.0  # 2^11 limb grid
    u1 = jnp.round(t * G) / G
    r1 = t - u1  # exact (aligned grids)
    u2 = jnp.round(r1 * (G * G)) / (G * G)
    r2 = r1 - u2  # exact

    def seg(v):
        return jax.ops.segment_sum(
            v, seg_ids, num_segments=num_segments, indices_are_sorted=True
        )

    y1 = seg(u1)  # exact: multiples of 2^-11, |sum| <= 2^12
    y2 = seg(u2)  # exact: multiples of 2^-22, |sum| <= 1
    y3 = seg(r2)  # |terms| <= 2^-23: plain sum error ~ eps * 2^-23 * n
    hi, err = _two_sum(y1, y2)
    lo = err + y3
    # scale back (power of two: exact) and fold the product low parts
    return hi * s, lo * s + seg(e)


def residual(K, x, rhs, K_lo=None):
    """rhs - (K + K_lo) @ x evaluated in double-float, f32 at the end.

    K: [N, N]; x, rhs: [N] or [N, R] (multi-RHS).  All f32 in, f32 out;
    accurate to ~eps^2 * ||K|| ||x|| instead of eps * ||K|| ||x||.
    ``K_lo`` optionally carries the lo part of a double-float K (its
    contribution is already eps-scaled, so a plain matvec suffices).
    """
    multi = x.ndim == 2
    if multi:
        # [R, N, N] product tensors via a leading RHS axis
        xe = x.T[:, None, :]  # [R, 1, N]
        rhs_e = rhs.T  # [R, N]
    else:
        xe = x[None, :]
        rhs_e = rhs
    p, e = _two_prod(K, xe)  # [.., N, N] exact products
    if K_lo is not None:
        e = e + K_lo * xe
    s_hi, s_lo = _df_reduce_last(p, e)  # [.., N]
    d_hi, d_err = _two_sum(rhs_e, -s_hi)
    out = d_hi + (d_err - s_lo)
    return out.T if multi else out
