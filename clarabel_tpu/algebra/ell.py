"""Row-sharded ELL sparse matrix for the intra-problem parallel path.

``ELLRowMat`` stores the constraint matrix A as row-padded ELL arrays
(``vals``/``cols``, shape [m, knz], knz = max nonzeros per row) sharded
over a 1-D device mesh axis.  It exists so that ``ShardedRowSolver`` can
take a tall scipy-sparse A (m >> n) without ever materializing the dense
[m, n] matrix on the host (VERDICT r4 #5): host memory stays O(nnz), the
host->device transfer is O(nnz), and each device receives only its own
row block.

All products run under ``shard_map`` with the communication pattern fixed
by construction (SURVEY §5.8):

- ``A @ x``   — local gather-multiply-sum per row block; no collectives.
- ``A.T @ z`` — per-shard scatter-add into [n] + one ``psum``.
- ``densify_sharded()`` — per-shard scatter into the dense [m_loc, n] row
  block, giving the MXU-friendly operand for the Schur Gram reduction
  (kkt/dense.py:prepare_schur_diag_rowsharded).  The dense block lives
  only on the devices, sharded; A is never all-gathered.

The reference has no analog (its CSC matvecs are single-threaded pointer
loops, algebra/csc/matrix_math.rs); this layout is the TPU re-expression:
padded regular shapes, gathers instead of indptr walks, collectives
instead of shared memory.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec


@jax.tree_util.register_pytree_node_class
class ELLRowMat:
    """Row-sharded padded-ELL sparse matrix supporting ``M @ x``, ``M.T``,
    row/col norms, and row/col scaling — the operations the IPM core
    needs from A (residual matvecs + Ruiz equilibration)."""

    def __init__(self, vals, cols, shape, mesh: Mesh, axis: str,
                 trans: bool = False):
        self.vals = vals
        self.cols = cols
        self.shape = tuple(int(s) for s in shape)  # logical (m, n)
        self.mesh = mesh
        self.axis = axis
        self.trans = bool(trans)

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.vals, self.cols), (self.shape, self.mesh, self.axis,
                                        self.trans)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        vals, cols = leaves
        shape, mesh, axis, trans = aux
        return cls(vals, cols, shape, mesh, axis, trans)

    # -- construction ----------------------------------------------------
    @classmethod
    def from_scipy(cls, A, mesh: Mesh, axis: str, dtype) -> "ELLRowMat":
        """Build from a scipy-sparse matrix whose row count divides the
        mesh size.  Peak host memory is O(nnz + m·knz)."""
        A = A.tocsr()
        A.sum_duplicates()
        m, n = A.shape
        ndev = mesh.devices.size
        if m % ndev:
            raise ValueError(f"rows ({m}) must divide the mesh ({ndev})")
        knz = max(int(np.diff(A.indptr).max(initial=0)), 1)
        vals = np.zeros((m, knz), dtype)
        cols = np.zeros((m, knz), np.int32)
        counts = np.diff(A.indptr)
        mask = np.arange(knz)[None, :] < counts[:, None]
        vals[mask] = A.data
        cols[mask] = A.indices
        sh = NamedSharding(mesh, PSpec(axis, None))
        return cls(
            jax.device_put(vals, sh), jax.device_put(cols, sh),
            (m, n), mesh, axis,
        )

    # -- products --------------------------------------------------------
    @property
    def T(self) -> "ELLRowMat":
        return ELLRowMat(self.vals, self.cols, self.shape[::-1], self.mesh,
                         self.axis, not self.trans)

    def __matmul__(self, x):
        P = PSpec
        # base orientation dims: vals/cols always describe [m_base, knz]
        # rows with column indices < n_base
        m_base, n_base = (self.shape[::-1] if self.trans else self.shape)
        if not self.trans:
            def f(vb, cb, xx):
                return jnp.sum(vb * xx[cb], axis=1)
            return jax.shard_map(
                f, mesh=self.mesh,
                in_specs=(P(self.axis, None), P(self.axis, None), P()),
                out_specs=P(self.axis),
            )(self.vals, self.cols, x)

        def ft(vb, cb, zb):
            part = jnp.zeros(n_base, vb.dtype).at[cb.ravel()].add(
                (vb * zb[:, None]).ravel()
            )
            return jax.lax.psum(part, self.axis)

        return jax.shard_map(
            ft, mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None), P(self.axis)),
            out_specs=P(),
        )(self.vals, self.cols, x)

    # -- equilibration support ------------------------------------------
    def row_abs_max(self):
        """Per-row inf-norm, [m] sharded over the row axis."""
        P = PSpec
        return jax.shard_map(
            lambda vb: jnp.max(jnp.abs(vb), axis=1, initial=0.0),
            mesh=self.mesh, in_specs=(P(self.axis, None),),
            out_specs=P(self.axis),
        )(self.vals)

    def col_abs_max(self):
        """Per-column inf-norm, [n] replicated (per-shard scatter-max +
        pmax over the row axis)."""
        P = PSpec
        n = self.shape[1]

        def f(vb, cb):
            part = jnp.zeros(n, vb.dtype).at[cb.ravel()].max(
                jnp.abs(vb).ravel()
            )
            return jax.lax.pmax(part, self.axis)

        return jax.shard_map(
            f, mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None)),
            out_specs=P(),
        )(self.vals, self.cols)

    def scale(self, e_row, d_col) -> "ELLRowMat":
        """diag(e_row) @ A @ diag(d_col) as a new ELLRowMat.  ``e_row``
        is [m] (sharded or replicated), ``d_col`` [n] replicated."""
        P = PSpec

        def f(vb, cb, eb, dd):
            return vb * eb[:, None] * dd[cb]

        vals = jax.shard_map(
            f, mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None), P(self.axis),
                      P()),
            out_specs=P(self.axis, None),
        )(self.vals, self.cols, e_row, d_col)
        return ELLRowMat(vals, self.cols, self.shape, self.mesh, self.axis,
                         self.trans)

    def densify_sharded(self):
        """The dense [m, n] matrix, sharded (rows, -) over the mesh — each
        device scatters only its own row block; no collective appears.
        This is the loop-invariant MXU operand for the Schur Gram
        reduction; it exists only on device, never on the host."""
        P = PSpec
        n = self.shape[1]

        def f(vb, cb):
            mloc, knz = vb.shape
            r = jnp.repeat(jnp.arange(mloc), knz)
            return jnp.zeros((mloc, n), vb.dtype).at[r, cb.ravel()].add(
                vb.ravel()
            )

        return jax.shard_map(
            f, mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None)),
            out_specs=P(self.axis, None),
        )(self.vals, self.cols)
