"""COO sparse matrix as a JAX pytree with scatter-sum matvec.

TPU-native stand-in for the reference's ``CscMatrix`` compute role
(reference: src/algebra/csc/matrix_math.rs gemv/symv): the reference walks
CSC column pointers with scalar loops; here the matrix is a flat triplet
set and every product is one gather + one ``segment_sum`` scatter — both
lower to efficient XLA TPU ops and are trivially differentiable/vmappable.

Structure (``rows``/``cols``/``shape``) is decided on the host at setup
and never changes inside a solve; only ``data`` carries per-solve numeric
content.  All three arrays are pytree leaves so jitted functions can take
a :class:`COOMat` directly as an argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class COOMat:
    """Sparse matrix in coordinate form supporting ``M @ x`` and ``M.T``."""

    def __init__(self, data, rows, cols, shape):
        self.data = data
        self.rows = rows
        self.cols = cols
        self.shape = tuple(int(s) for s in shape)

    # -- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        return (self.data, self.rows, self.cols), self.shape

    @classmethod
    def tree_unflatten(cls, shape, leaves):
        data, rows, cols = leaves
        return cls(data, rows, cols, shape)

    # -- construction ----------------------------------------------------
    @classmethod
    def from_scipy(cls, M, dtype, device=None):
        """Build from a scipy sparse matrix, staging through NumPy so the
        arrays land directly on ``device`` (never the default accelerator)."""
        coo = M.tocoo()
        put = lambda v: jax.device_put(np.asarray(v), device)
        return cls(
            put(coo.data.astype(dtype)),
            put(coo.row.astype(np.int32)),
            put(coo.col.astype(np.int32)),
            coo.shape,
        )

    # -- linear algebra ---------------------------------------------------
    @property
    def T(self) -> "COOMat":
        return COOMat(self.data, self.cols, self.rows, self.shape[::-1])

    def __matmul__(self, x):
        return jax.ops.segment_sum(
            self.data * x[self.cols], self.rows, num_segments=self.shape[0]
        )

    def with_data(self, data) -> "COOMat":
        return COOMat(data, self.rows, self.cols, self.shape)

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    def __repr__(self):  # pragma: no cover - cosmetic
        return f"COOMat(shape={self.shape}, nnz={self.nnz})"
