"""Pallas TPU kernel: batched partial LDLᵀ of multifrontal front batches.

Replaces the XLA op-chain of :func:`multifrontal.partial_ldl` (per 32-column
block: scan + triangular_solve + concat + slice-set + einsum ≈ 5 dispatches)
with ONE fused kernel per front bucket.  At the front sizes the level
schedule produces (r_pad ≤ a few hundred), the factor is bound by per-op
dispatch overhead, not flops — fusing the whole partial factorization into
a single VMEM-resident kernel removes that bound.

Per grid step the kernel holds a block of ``KB`` fronts [KB, r, r] in VMEM
and eliminates the ``c`` pivot columns in 32-wide panels: masked rank-1
steps (VPU) inside the panel, one batched ``dot_general`` (MXU) for each
trailing update.  Per-pivot dynamic regularization with expected signs runs
inside the kernel (reference: src/qdldl/qdldl.rs:517-527).

Output contract matches :func:`multifrontal.partial_ldl`: the first ``c``
columns hold unit-lower L (zero at and above the pivot row), ``d`` is
returned separately, and the trailing [c:, c:] block is the Schur
complement (lower triangle valid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pivot-panel width: 128 matches the TPU lane tile — panel slices of the
# front's last dim are tile-aligned.  Narrower panels (32) trigger Mosaic
# relayout copies per fori step: measured 34.6 ms vs 0.08 ms for the same
# (95, c=128, r=160) bucket.
_PW = 128
_BK = 32   # inner rank-1 chain length (f32 accuracy: match the XLA path)
_VMEM_BYTES = 13 * 2 ** 20  # total scoped-VMEM budget (hardware limit 16M)


def lane_block(r_pad: int, dtype_bytes: int = 4) -> int:
    """Lanes per grid step so the kernel's scoped VMEM fits: the in + out
    front blocks plus the panel/trailing-update temporaries come to ~5
    front-sized buffers per lane (measured against Mosaic's allocator).
    Capped at 8: larger lane blocks trip pathological Mosaic layout
    choices on some shapes (measured 28.8 ms vs 0.08 ms for the same
    (95, c=128, r=160) bucket at KB=16 vs KB=8), and per-grid-step
    overhead is negligible at these sizes."""
    per_lane = 5 * r_pad * r_pad * dtype_bytes
    kb = max(1, _VMEM_BYTES // max(per_lane, 1))
    kb = 1 << (kb.bit_length() - 1)
    return int(min(kb, 8))


def supported(c_pad: int, r_pad: int, dtype) -> bool:
    """Kernel applicability gate: f32 fronts small enough for VMEM and a
    bounded unroll (Mosaic chokes on very long static unrolls)."""
    return (
        jnp.dtype(dtype) == jnp.float32
        and c_pad <= 256
        and r_pad <= 512
        and lane_block(r_pad) >= 1
    )


@functools.partial(
    jax.jit, static_argnames=("c", "eps", "delta", "interpret")
)
def front_partial_ldl(F, signs, c, eps, delta, interpret=False):
    """Batched partial LDLᵀ.  ``F``: [k, r, r] fronts (lower triangles
    valid), ``signs``: [k, c] expected pivot signs.  Returns (Fout, d) with
    the contract of :func:`multifrontal.partial_ldl` (Fout[:, :, :c] = L
    columns, Fout[:, c:, c:] = Schur complement)."""
    k, r, _ = F.shape
    KB = lane_block(r)
    kp = ((k + KB - 1) // KB) * KB
    if kp != k:
        # pad lanes are all-zero fronts: pivots regularize to delta·sign,
        # L stays zero — factored identically to real pad columns
        F = jnp.concatenate([F, jnp.zeros((kp - k, r, r), F.dtype)], axis=0)
        signs = jnp.concatenate(
            [signs, jnp.ones((kp - k, c), signs.dtype)], axis=0
        )

    n_panels = (c + _PW - 1) // _PW

    def kernel(F_ref, sign_ref, out_ref, d_ref):
        out_ref[:] = F_ref[:]

        for p in range(n_panels):
            p0 = p * _PW
            p_end = min(p0 + _PW, c)
            w = p_end - p0                            # static panel width
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (KB, r, w), 1)
            pcol_ids = jax.lax.broadcasted_iota(jnp.int32, (KB, r, w), 2)
            loc_ids = jax.lax.broadcasted_iota(jnp.int32, (KB, w), 1)
            panel = out_ref[:, :, p0:p_end]           # [KB, r, w]
            dvec = jnp.ones((KB, w), F.dtype)
            sblk = sign_ref[:, p0:p_end]

            # inner 32-column blocks: the sequential rank-1 chain is
            # confined to one block (matching the XLA path's f32 rounding
            # behavior — 128-long chains stall iterative refinement);
            # later panel columns update via full-width masked MXU dots,
            # never slicing the lane dimension
            for s0 in range(0, w, _BK):
                s1 = min(s0 + _BK, w)

                def col_step(t, carry, s1=s1):
                    panel, dvec = carry
                    j = p0 + t
                    colj = jnp.sum(
                        jnp.where(pcol_ids == t, panel, 0.0), axis=2
                    )                                  # [KB, r]
                    is_piv = row_ids[:, :, 0] == j     # [KB, r]
                    d = jnp.sum(jnp.where(is_piv, colj, 0.0), axis=1)
                    sg = jnp.sum(jnp.where(loc_ids == t, sblk, 0.0), axis=1)
                    d = jnp.where(d * sg < eps, delta * sg, d)
                    l = jnp.where(
                        row_ids[:, :, 0] > j, colj / d[:, None], 0.0
                    )                                  # [KB, r]
                    # rank-1 update only of the later columns WITHIN the
                    # 32-block
                    rowj = jnp.sum(
                        jnp.where(row_ids == j, panel, 0.0), axis=1
                    )                                  # [KB, w]
                    rowv = jnp.where(
                        (loc_ids > t) & (loc_ids < s1), rowj, 0.0
                    )
                    panel = panel - l[:, :, None] * rowv[:, None, :]
                    onehot = (pcol_ids == t).astype(panel.dtype)
                    panel = panel * (1.0 - onehot) + l[:, :, None] * onehot
                    dvec = jnp.where(loc_ids == t, d[:, None], dvec)
                    return panel, dvec

                panel, dvec = jax.lax.fori_loop(
                    s0, s1, col_step, (panel, dvec)
                )

                if s1 < w:
                    # inter-block update of panel columns >= s1:
                    # F[:, i, t'] -= Σ_{t in block} L[:, i, t]·d_t·L[:, t', t]
                    blk = (loc_ids >= s0) & (loc_ids < s1)    # [KB, w]
                    Wd = panel * jnp.where(blk, dvec, 0.0)[:, None, :]
                    R_all = panel[:, p0:p_end, :]             # [KB, w, w]
                    upd = jax.lax.dot_general(
                        Wd, R_all,
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=F.dtype,
                        precision=jax.lax.Precision.HIGHEST,
                    )                                          # [KB, r, w]
                    later = (loc_ids >= s1).astype(F.dtype)
                    panel = panel - upd * later[:, None, :]

            out_ref[:, :, p0:p_end] = panel
            d_ref[:, p0:p_end] = dvec

            # trailing update of all later front columns (MXU):
            #   F[:, i, t'] -= Σ_t L[:, i, t]·d_t·L[:, t', t]   for t' >= p_end
            if p_end < r:
                W = panel * dvec[:, None, :]           # [KB, r, w]
                R = panel[:, p_end:, :]                # [KB, r-p_end, w]
                upd = jax.lax.dot_general(
                    W, R,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=F.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )                                      # [KB, r, r-p_end]
                out_ref[:, :, p_end:] = out_ref[:, :, p_end:] - upd

    grid = (kp // KB,)
    Fout, dout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((KB, r, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KB, r, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp, r, r), F.dtype),
            jax.ShapeDtypeStruct((kp, c), F.dtype),
        ],
        interpret=interpret,
    )(F, signs)
    return Fout[:k], dout[:k]
