"""COO sparse matrix as a JAX pytree, with a DIA fast path for matvecs.

TPU-native stand-in for the reference's ``CscMatrix`` compute role
(reference: src/algebra/csc/matrix_math.rs gemv/symv): the reference walks
CSC column pointers with scalar loops; here the matrix is a flat triplet
set and every product is one gather + one ``segment_sum`` scatter — both
lower to XLA TPU ops and are trivially differentiable/vmappable.

TPU index ops cost ~13 ns/element, so a 1e5-nnz segment matvec costs
milliseconds while the arithmetic is microseconds.  When the pattern has a
compact set of diagonal offsets (banded P, stacked-identity A — the MPC /
graph-Laplacian shapes the sparse path exists for), :meth:`predia` lays
the values out by diagonal ONCE per solve (one scatter) and every
subsequent product — including transposed products — is pure vector math
with *static* shifts: ``y = Σ_o d_o ⊙ shift(x, o)``.  The IPM runs ~9
products per iteration on fixed values (residuals, τ recovery), so the
one-scatter amortizes immediately.  Patterns without a compact offset set
keep the segment path (``dia_offsets is None``).

Structure (``rows``/``cols``/``shape``/``dia_*``) is decided on the host
at setup and never changes inside a solve; only ``data`` (and the derived
``kd``) carry per-solve numeric content.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

#: DIA applicability: at most this many distinct offsets, and the dense
#: [O, rows] layout may not blow up memory vs the triplet form
_DIA_MAX_OFFSETS = 96


def dia_metadata(rows, cols, shape):
    """Host-side: (offsets tuple, positions into the flat [O·m] layout) if
    the pattern is DIA-compact, else (None, None)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    m = int(shape[0])
    if rows.size == 0:
        return None, None
    offs = cols - rows
    uoff = np.unique(offs)
    if uoff.size > _DIA_MAX_OFFSETS or uoff.size * m > max(
        8 * rows.size, 1 << 20
    ):
        return None, None
    oidx = np.searchsorted(uoff, offs)
    pos = (oidx * m + rows).astype(np.int32)
    return tuple(int(o) for o in uoff), pos


@jax.tree_util.register_pytree_node_class
class COOMat:
    """Sparse matrix in coordinate form supporting ``M @ x`` and ``M.T``.

    ``dia_pos``/``kd`` (optional leaves) carry the DIA fast path; ``trans``
    marks a transposed view (``kd`` always describes the base orientation
    ``base_shape``)."""

    def __init__(self, data, rows, cols, shape, dia_pos=None, kd=None,
                 dia_offsets=None, trans=False):
        self.data = data
        self.rows = rows
        self.cols = cols
        self.shape = tuple(int(s) for s in shape)
        self.dia_pos = dia_pos
        self.kd = kd
        self.dia_offsets = dia_offsets
        self.trans = bool(trans)

    # -- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        return (
            (self.data, self.rows, self.cols, self.dia_pos, self.kd),
            (self.shape, self.dia_offsets, self.trans),
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        data, rows, cols, dia_pos, kd = leaves
        shape, dia_offsets, trans = aux
        return cls(data, rows, cols, shape, dia_pos, kd, dia_offsets, trans)

    # -- construction ----------------------------------------------------
    @classmethod
    def from_scipy(cls, M, dtype, device=None, dia=False):
        """Build from a scipy sparse matrix, staging through NumPy so the
        arrays land directly on ``device`` (never the default
        accelerator).  ``dia=True`` attaches DIA metadata when the
        pattern is compact."""
        coo = M.tocoo()
        put = lambda v: jax.device_put(np.asarray(v), device)
        dia_pos = None
        offsets = None
        if dia:
            offsets, pos = dia_metadata(coo.row, coo.col, coo.shape)
            if offsets is not None:
                dia_pos = put(pos)
        return cls(
            put(coo.data.astype(dtype)),
            put(coo.row.astype(np.int32)),
            put(coo.col.astype(np.int32)),
            coo.shape,
            dia_pos=dia_pos,
            dia_offsets=offsets,
        )

    # -- linear algebra ---------------------------------------------------
    @property
    def base_shape(self):
        return self.shape[::-1] if self.trans else self.shape

    @property
    def T(self) -> "COOMat":
        return COOMat(self.data, self.cols, self.rows, self.shape[::-1],
                      self.dia_pos, self.kd, self.dia_offsets,
                      not self.trans)

    def predia(self) -> "COOMat":
        """Materialize the DIA layout from the current values (one sorted
        scatter); no-op when the pattern is not DIA-compact.  Call once
        per solve, after the values are final (post-equilibration)."""
        if self.dia_offsets is None or self.kd is not None:
            return self
        O = len(self.dia_offsets)
        m = self.base_shape[0]
        kd = (
            jnp.zeros(O * m, self.data.dtype)
            .at[self.dia_pos]
            .set(self.data, unique_indices=True)
            .reshape(O, m)
        )
        return COOMat(self.data, self.rows, self.cols, self.shape,
                      self.dia_pos, kd, self.dia_offsets, self.trans)

    def _dia_mv(self, x):
        offs = self.dia_offsets
        m, n = self.base_shape
        if not self.trans:
            # y[i] = Σ_o d_o[i]·x[i+o]
            lo = max(0, -min(offs))
            hi = max(0, m - 1 + max(offs) - (n - 1))
            xp = jnp.pad(x, (lo, hi))
            y = jnp.zeros(m, x.dtype)
            for oi, o in enumerate(offs):
                y = y + self.kd[oi] * jax.lax.dynamic_slice_in_dim(
                    xp, lo + o, m
                )
            return y
        # transposed product: y[j] = Σ_o (d_o ⊙ z)[j - o]
        pl = max(0, max(offs))
        pr = max(0, (n - 1) - min(offs) - (m - 1))
        y = jnp.zeros(n, x.dtype)
        for oi, o in enumerate(offs):
            wp = jnp.pad(self.kd[oi] * x, (pl, pr))
            y = y + jax.lax.dynamic_slice_in_dim(wp, pl - o, n)
        return y

    def __matmul__(self, x):
        if self.kd is not None and x.ndim == 1:
            return self._dia_mv(x)
        return jax.ops.segment_sum(
            self.data * x[self.cols], self.rows, num_segments=self.shape[0]
        )

    def with_data(self, data) -> "COOMat":
        # kd is derived from data and now stale; predia() re-materializes
        return COOMat(data, self.rows, self.cols, self.shape,
                      self.dia_pos, None, self.dia_offsets, self.trans)

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    def __repr__(self):  # pragma: no cover - cosmetic
        return f"COOMat(shape={self.shape}, nnz={self.nnz})"
