"""Intra-problem model parallelism: one large conic program sharded over a
device mesh.

The constraint dimension m (rows of A, entries of b/s/z) is sharded over a
mesh axis while the variable dimension stays replicated.  Because the whole
solve is already one pure jitted computation over fixed-shape arrays, the
partitioning is expressed entirely through ``jax.sharding`` annotations on
the inputs: XLA's SPMD partitioner propagates the shardings through the IPM
loop and inserts the collectives (psum for the AᵀH⁻¹A Gram reduction and
the residual norms, all-gathers where the KKT factorization needs
replication) over ICI.

This is the first-class "Schur-complement partitioned KKT" axis of the TPU
design (SURVEY.md §2.9 / BASELINE.md): the Gram-matrix reduction
S = P̃ + Σ_k A_kᵀ H_k⁻¹ A_k is exactly the partitioned computation, with
the small [n, n] factorization replicated.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from .. import solver as _solver
from ..cones import api
from ..cones.layout import ConeLayout
from ..infbound import get_infinity
from ..settings import DefaultSettings
from ..statuses import SolverStatus


class ShardedRowSolver:
    """Solve ONE conic program with the constraint rows sharded over a
    1-D mesh axis.

    Best suited to tall problems (m >> n) with row-decomposable cones
    (zero / nonnegative; SOC and 3-D cone groups are kept replicated by
    XLA automatically if present).  The row permutation and presolve run
    on the host exactly as in :class:`~clarabel_tpu.DefaultSolver`.

    ``A`` may be scipy-sparse: on the explicit-collective path
    (zero/NN layouts, f32) it is kept sparse end to end as row-sharded
    padded-ELL blocks (:class:`~clarabel_tpu.algebra.ell.ELLRowMat`) —
    the host never materializes the dense [m, n] matrix, each device
    receives only its own rows, and the per-shard Gram tile is scattered
    densely on device only for the MXU Schur reduction.  ``P`` is always
    densified ([n, n] is the replicated small side).
    """

    def __init__(
        self,
        P,
        q,
        A,
        b,
        cones: Sequence[api.ConeSpec],
        settings: Optional[DefaultSettings] = None,
        mesh: Optional[Mesh] = None,
        dtype: str = "float32",
    ):
        if mesh is None or len(mesh.axis_names) != 1:
            raise ValueError("ShardedRowSolver requires a 1-D mesh")
        self.settings = settings if settings is not None else DefaultSettings()
        self.settings.validate()
        self._mesh = mesh
        axis = mesh.axis_names[0]

        import scipy.sparse as sp

        from ..algebra.ell import ELLRowMat

        q = np.asarray(q, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        A_sparse_in = sp.issparse(A)
        P, _ = _solver._to_dense(P, "P")  # [n, n]: replicated, small side
        P = _solver._symmetrize_triu(P)

        cones_int = list(api.collapse_cones(tuple(cones)))
        b = np.minimum(b, get_infinity())

        n, m_user = q.shape[0], b.shape[0]
        self.n, self.m = n, m_user
        ndev = mesh.devices.size

        # diagonal-Hs layouts (zero/NN cones) take the shard_map Schur
        # path: the A'H⁻¹A Gram reduction is an explicit per-shard matmul
        # + psum and A is never gathered (kkt/dense.py
        # prepare_schur_diag_rowsharded).  Other layouts fall back to
        # GSPMD propagation through the dense factorization.
        diag_hs = all(
            c.kind in (api.ZERO, api.NONNEGATIVE) for c in cones_int
        )
        explicit = diag_hs and np.dtype(dtype) == np.float32
        # sparse A stays sparse on the explicit-collective path (ELL row
        # blocks, VERDICT r4 #5): the host never materializes the dense
        # [m, n] matrix and each device receives only its own rows.  The
        # GSPMD fallback path (non-diagonal layouts) still needs dense A.
        sparse_path = A_sparse_in and explicit
        if not sparse_path:
            A, _ = _solver._to_dense(A, "A")

        # pad the row dimension to a multiple of the mesh size with free
        # nonnegative rows (0·x + s = 1, s >= 0): structurally inert, so
        # uneven problems shard without user-side surgery
        pad = (-m_user) % ndev
        self._row_pad = pad
        if pad:
            if sparse_path:
                A = sp.vstack(
                    [A.tocsr(), sp.csr_matrix((pad, n))], format="csr"
                )
            else:
                A = np.vstack([A, np.zeros((pad, n))])
            b = np.concatenate([b, np.ones(pad)])
            cones_int.append(api.ConeSpec(api.NONNEGATIVE, pad))

        self._layout = ConeLayout(tuple(cones_int))
        perm = self._layout.perm
        A = A.tocsr()[perm, :] if sparse_path else A[perm, :]
        b = b[perm]

        row_shard = (mesh, axis) if explicit else None
        self._explicit_collectives = row_shard is not None
        self._sparse_A = sparse_path

        core = _solver.build_solve_core(
            self._layout, self.settings, n, not np.any(P), dtype,
            row_shard=row_shard,
        )

        row = NamedSharding(mesh, PSpec(axis))
        row2d = NamedSharding(mesh, PSpec(axis, None))
        rep = NamedSharding(mesh, PSpec())
        rep2d = NamedSharding(mesh, PSpec(None, None))

        self._P = jax.device_put(np.asarray(P, dtype), rep2d)
        self._q = jax.device_put(np.asarray(q, dtype), rep)
        self._b = jax.device_put(np.asarray(b, dtype), row)
        if sparse_path:
            self._A = ELLRowMat.from_scipy(A, mesh, axis, dtype)
            # A is a pytree input; its leaves carry their shardings from
            # from_scipy's device_put, so jit infers the placement
            self._solve_fn = jax.jit(core)
        else:
            self._A = jax.device_put(np.asarray(A, dtype), row2d)
            self._solve_fn = jax.jit(
                core, in_shardings=(rep2d, rep, row2d, row)
            )

    def solve(self):
        t0 = time.perf_counter()
        out = self._solve_fn(self._P, self._q, self._A, self._b)
        out = jax.tree.map(np.asarray, jax.device_get(out))
        solve_time = time.perf_counter() - t0

        m_total = self._layout.m
        z = np.empty(m_total, np.float64)
        s = np.empty(m_total, np.float64)
        z[self._layout.perm] = out["z"]
        s[self._layout.perm] = out["s"]
        # drop the shard-padding rows (appended after the user cones)
        z = z[: self.m]
        s = s[: self.m]

        return _solver.DefaultSolution(
            x=np.asarray(out["x"], np.float64),
            z=z,
            s=s,
            status=SolverStatus(int(out["status"])),
            obj_val=float(out["obj_val"]),
            obj_val_dual=float(out["obj_val_dual"]),
            solve_time=solve_time,
            iterations=int(out["iterations"]),
            r_prim=float(out["r_prim"]),
            r_dual=float(out["r_dual"]),
        )
