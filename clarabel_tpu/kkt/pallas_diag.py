"""Pallas TPU kernel: the multifrontal engine's sequential pivot scan.

:func:`multifrontal._diag_factor` is the only sequential chain in the
sparse engine — a ``lax.scan`` over the ≤32 pivots of each diagonal
block, ~5 small XLA ops per step.  At N=60k the schedule runs ~1.2k
sequential pivots ⇒ ~6k dependent dispatches ⇒ ~8 ms of pure latency
(measured; scripts/profile_factor.py).  This kernel runs one WHOLE
block's chain per dispatch (one `pl.pallas_call` instead of ~160 ops),
with arithmetic that matches the XLA scan step for step: masked column
extraction, per-pivot expected-sign dynamic regularization
(reference: src/qdldl/qdldl.rs:517-527), rank-1 VPU update.  No
``dot_general`` anywhere — the r2 Pallas front kernel's accuracy loss
came from MXU contraction-order roundoff in its inter-block dots
(STATUS.md), which this kernel structurally cannot reproduce.

Everything outside the chain (L21 triangular solves, inter-block and
trailing Schur updates) stays in XLA where it is already MXU-shaped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: lanes per grid step.  Blocks are [KB, b, b] with b ≤ 64 — tiny — but
#: large lane blocks trip pathological Mosaic layouts on some shapes
#: (measured on the front kernel, pallas_front.lane_block), so stay modest.
_KB = 128


def supported(b: int, dtype) -> bool:
    return jnp.dtype(dtype) == jnp.float32 and b <= 64


@functools.partial(jax.jit, static_argnames=("eps", "delta", "interpret"))
def diag_ldl(D, signs, eps, delta, interpret=False):
    """LDLᵀ of a batch of ``b×b`` diagonal blocks (lower triangles valid).

    Drop-in for :func:`multifrontal._diag_factor`: returns (L, d) with
    unit-lower ``L`` (zeros at and above the diagonal) and regularized
    pivots ``d``.
    """
    k, b, _ = D.shape
    KB = min(_KB, max(k, 1))
    kp = ((k + KB - 1) // KB) * KB
    if kp != k:
        # pad lanes are all-zero blocks: pivots regularize to delta·sign
        # and their L stays zero — same discipline as pad columns
        D = jnp.concatenate([D, jnp.zeros((kp - k, b, b), D.dtype)], axis=0)
        signs = jnp.concatenate(
            [signs, jnp.ones((kp - k, b), signs.dtype)], axis=0
        )

    def kernel(D_ref, sign_ref, L_ref, d_ref):
        Dm = D_ref[:]                                  # [KB, b, b]
        sgn = sign_ref[:]                              # [KB, b]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (KB, b, b), 1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (KB, b, b), 2)
        loc_ids = jax.lax.broadcasted_iota(jnp.int32, (KB, b), 1)

        def step(t, carry):
            Dm, L, dvec = carry
            colj = jnp.sum(jnp.where(col_ids == t, Dm, 0.0), axis=2)
            d = jnp.sum(jnp.where(loc_ids == t, colj, 0.0), axis=1)
            sg = jnp.sum(jnp.where(loc_ids == t, sgn, 0.0), axis=1)
            d = jnp.where(d * sg < eps, delta * sg, d)
            below = loc_ids > t                        # [KB, b]
            l = jnp.where(below, colj / d[:, None], 0.0)
            rowv = jnp.where(below, colj, 0.0)         # row t via symmetry
            Dm = Dm - l[:, :, None] * rowv[:, None, :]
            L = L + l[:, :, None] * (col_ids == t).astype(L.dtype)
            dvec = jnp.where(loc_ids == t, d[:, None], dvec)
            return Dm, L, dvec

        _, L, dvec = jax.lax.fori_loop(
            0, b, step,
            (Dm, jnp.zeros_like(Dm), jnp.ones((KB, b), Dm.dtype)),
        )
        L_ref[:] = L
        d_ref[:] = dvec

    L, d = pl.pallas_call(
        kernel,
        grid=(kp // KB,),
        in_specs=[
            pl.BlockSpec((KB, b, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KB, b, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp, b, b), D.dtype),
            jax.ShapeDtypeStruct((kp, b), D.dtype),
        ],
        interpret=interpret,
    )(D, signs)
    return L[:k], d[:k]
