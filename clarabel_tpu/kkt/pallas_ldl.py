"""Pallas TPU kernel: batched unpivoted LDLᵀ of quasidefinite KKT matrices.

The TPU-native counterpart of the reference's QDLDL numeric factorization
(reference: src/qdldl/qdldl.rs:468-700): the quasidefinite KKT matrix
K = [[P̃, Aᵀ], [A, -H̃]] factors stably without pivoting, with the
reference's per-pivot *dynamic regularization* (qdldl.rs:517-527 — pivots
whose signed value drops below eps are replaced by ±delta according to the
expected inertia) applied inside the kernel.

Unlike the Schur-complement condensation, factoring the full quasidefinite
system does not square the conditioning — this is the accuracy-critical
path for f32 TPU solves.

The kernel keeps the whole (padded) matrix resident in VMEM and eliminates
one column per step with masked symmetric rank-1 updates on the VPU; the
packed output holds L (unit diagonal implied) in the strict lower triangle
and D on the diagonal.  Solves use XLA's native triangular solves.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(n: int, multiple: int = 128) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def _ldl_kernel_call_blocked(K_pad, dsigns_np, *, eps, delta, n_total,
                             interpret=False):
    """Panel-blocked variant: 128-column panels eliminated with rank-1
    steps confined to the [Np, 128] panel slice, followed by ONE MXU
    matmul per panel for the trailing symmetric update
    (K₂₂ -= L₂₁ D L₂₁ᵀ).  The MXU carries the O(N·Np²) bulk of the work;
    the VPU only does O(N·Np·128).
    """
    Np = K_pad.shape[-1]
    PW = 128
    n_panels = (n_total + PW - 1) // PW

    def kernel(K_ref, out_ref):
        out_ref[:] = K_ref[:]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
        pcol_ids = jax.lax.broadcasted_iota(jnp.int32, (1, PW), 1)

        for p in range(n_panels):
            p0 = p * PW
            p_end = p0 + PW
            cols_in_panel = min(PW, n_total - p0)

            # ---- panel factorization: rank-1 steps on [Np, PW].
            # Panel columns receive every update, so below the diagonal
            # they hold the un-normalized L·d values at completion.
            dvec = jnp.ones((1, PW), K_pad.dtype)
            for j_local in range(cols_in_panel):
                j = p0 + j_local
                panel = out_ref[:, p0:p_end]  # [Np, PW]
                rowj = panel[j, :].reshape(1, PW)

                d = jnp.sum(jnp.where(pcol_ids == j_local, rowj, 0.0))
                sign = float(dsigns_np[0, j])
                d = jnp.where(d * sign < eps, delta * sign, d)
                dvec = jnp.where(pcol_ids == j_local, d, dvec)

                rowv = jnp.where(pcol_ids > j_local, rowj, 0.0)  # [1, PW]
                colj = jnp.sum(
                    jnp.where(pcol_ids == j_local, panel, 0.0),
                    axis=1,
                    keepdims=True,
                )  # [Np, 1]
                colv = jnp.where(row_ids > j, colj, 0.0) / d

                out_ref[:, p0:p_end] = panel - colv * rowv

            # ---- normalize the panel into packed-L form (L strictly
            # below the diagonal, D on the diagonal, zeros above)
            panel = out_ref[:, p0:p_end]
            diag_pos = p0 + pcol_ids  # [1, PW] global row of each diagonal
            below = row_ids > diag_pos
            packed = jnp.where(
                below,
                panel / dvec,
                jnp.where(row_ids == diag_pos, dvec + 0.0 * panel, 0.0),
            )
            out_ref[:, p0:p_end] = packed

            # ---- trailing symmetric update K22 -= L21 D L21ᵀ (MXU) ----
            if p_end < n_total:
                B = out_ref[p_end:, p0:p_end]  # [M, PW] = L21
                upd = jax.lax.dot_general(
                    B * dvec,
                    B,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=K_pad.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )
                out_ref[p_end:, p_end:] = out_ref[p_end:, p_end:] - upd

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Np), K_pad.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(K_pad)


def _ldl_kernel_call_unrolled(K_pad, dsigns_np, *, eps, delta, n_total,
                              interpret=False):
    """Fully static variant: the column loop is unrolled at trace time, so
    the kernel contains no dynamic indexing at all (static row slices and
    numpy-constant masks) — the Mosaic-friendly form.

    ``dsigns_np`` is a NumPy constant captured at trace time.
    """
    Np = K_pad.shape[-1]

    def kernel(K_ref, out_ref):
        out_ref[:] = K_ref[:]
        # masks built inside the kernel (captured array constants are
        # not allowed in pallas kernels)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
        for j in range(n_total):
            row = out_ref[j, :].reshape(1, Np)
            d = row[0, j]
            sign = float(dsigns_np[0, j])
            d = jnp.where(d * sign < eps, delta * sign, d)

            rowv = jnp.where(col_ids > j, row, 0.0)      # [1, Np]
            colv = rowv.reshape(Np, 1) / d               # [Np, 1] (masked)

            out_ref[:] = out_ref[:] - colv * rowv
            packed_row = jnp.where(col_ids == j, d, rowv / d)
            out_ref[j, :] = packed_row.reshape(Np)
        # zero any padding rows beyond n_total are left as identity

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Np), K_pad.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(K_pad)


@functools.partial(
    jax.jit, static_argnames=("eps", "delta", "n_total", "interpret")
)
def _ldl_kernel_call(K_pad, dsigns_pad, eps, delta, n_total, interpret=False):
    Np = K_pad.shape[-1]

    def kernel(K_ref, sign_ref, out_ref):
        out_ref[:] = K_ref[:]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

        def body(j, _):
            # current row of the trailing matrix (entries k > j are still
            # un-eliminated; entries k < j hold packed rows, masked out)
            row = out_ref[pl.ds(j, 1), :]  # [1, Np]

            d = jnp.sum(jnp.where(col_ids == j, row, 0.0))
            sign = jnp.sum(jnp.where(col_ids == j, sign_ref[:], 0.0))
            # dynamic regularization (qdldl.rs:517-527)
            d = jnp.where(d * sign < eps, delta * sign, d)

            rowv = jnp.where(col_ids > j, row, 0.0)  # [1, Np]
            colv = jnp.where(row_ids > j, rowv.T, 0.0) / d  # [Np, 1]

            # trailing symmetric rank-1 update (rows <= j untouched since
            # colv is zero there)
            out_ref[:] = out_ref[:] - colv * rowv

            # write row j of the packed factor: D at (j, j), the j-th
            # column of L transposed to the right of the diagonal.
            # (Row stores index the sublane dimension — the TPU-friendly
            # direction; the packed result is Lᵀ with D on the diagonal.)
            packed_row = rowv / d + jnp.where(col_ids == j, d, 0.0)
            out_ref[pl.ds(j, 1), :] = packed_row
            return 0

        jax.lax.fori_loop(0, n_total, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Np), K_pad.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(K_pad, dsigns_pad)


def make_ldl_factor(n: int, m: int, settings, dtype, interpret: bool = False,
                    variant: str = "auto"):
    """Build the factor function for (n + m)-dimensional KKT matrices.

    Returns ``factor(K_reg) -> (("pldl", packed), ok)`` with packed factors
    in a form consumed by :func:`ldl_solve`.
    """
    N = n + m
    Np = _pad_to(N)
    # expected inertia signs: +1 for the first n entries, -1 for the m
    # cone rows (directldlkktsolver.rs:392-405); padding is +1 so the
    # padded identity block factors cleanly
    dsigns = np.ones((1, Np), np.float32)
    dsigns[0, n:N] = -1.0
    dsigns_pad = jnp.asarray(dsigns, dtype)

    eps = settings.dynamic_regularization_eps
    delta = settings.dynamic_regularization_delta
    if not settings.dynamic_regularization_enable:
        eps, delta = -np.inf, 0.0

    if variant == "auto":
        # the fully-unrolled rank-1 kernel is marginally faster for small
        # systems but Mosaic fails on its ~512-step unroll; the panel-
        # blocked MXU kernel scales to large N with identical accuracy
        variant = "unrolled" if N <= 256 else "blocked"

    def factor(K_reg):
        K_pad = jnp.zeros((Np, Np), K_reg.dtype)
        K_pad = K_pad.at[:N, :N].set(K_reg)
        K_pad = K_pad.at[jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
        if variant == "blocked":
            packed = _ldl_kernel_call_blocked(
                K_pad, dsigns, eps=float(eps), delta=float(delta),
                n_total=N, interpret=interpret,
            )
            ok = jnp.all(jnp.isfinite(packed))
            return ("pldl_lower", (packed, N)), ok
        elif variant == "unrolled":
            packed = _ldl_kernel_call_unrolled(
                K_pad, dsigns, eps=float(eps), delta=float(delta),
                n_total=N, interpret=interpret,
            )
        else:
            packed = _ldl_kernel_call(
                K_pad, dsigns_pad, eps=float(eps), delta=float(delta),
                n_total=N, interpret=interpret,
            )
        ok = jnp.all(jnp.isfinite(packed))
        return ("pldl", (packed, N)), ok

    return factor


def ldl_solve_lower(packed, N, rhs):
    """Solve K x = rhs from packed-L factors (blocked kernel layout:
    L strictly below the diagonal, D on the diagonal)."""
    Np = packed.shape[-1]
    b = jnp.zeros(Np, rhs.dtype).at[:N].set(rhs)

    L = jnp.tril(packed, -1) + jnp.eye(Np, dtype=packed.dtype)
    d = jnp.diagonal(packed)

    y = jax.scipy.linalg.solve_triangular(L, b, lower=True, unit_diagonal=True)
    y = y / d
    x = jax.scipy.linalg.solve_triangular(
        L, y, trans="T", lower=True, unit_diagonal=True
    )
    return x[:N]


def ldl_solve(packed, N, rhs):
    """Solve K x = rhs from the packed factors.

    ``packed`` holds Lᵀ in the strict upper triangle (unit diagonal
    implied) and D on the diagonal.
    """
    Np = packed.shape[-1]
    b = jnp.zeros(Np, rhs.dtype).at[:N].set(rhs)

    U = jnp.triu(packed, 1) + jnp.eye(Np, dtype=packed.dtype)  # = Lᵀ
    d = jnp.diagonal(packed)

    # L y = b  (L = Uᵀ)
    y = jax.scipy.linalg.solve_triangular(
        U, b, trans="T", lower=False, unit_diagonal=True
    )
    y = y / d
    # Lᵀ x = y
    x = jax.scipy.linalg.solve_triangular(
        U, y, lower=False, unit_diagonal=True
    )
    return x[:N]
