"""Scenario-batch data parallelism: vmapped IPM over problem batches.

This is the first-class parallelism axis of the TPU design (SURVEY.md §2.9):
many conic programs with identical structure (same cone layout and shapes,
different numeric data) solve as ONE vmapped XLA computation, sharded over a
device mesh.  Per-instance convergence is handled by the solver's own
masked-state while loop — converged lanes freeze while the batch runs to
collective completion, and XLA inserts the cross-device reduction for the
loop predicate automatically.

The reference has no equivalent (it is a single-threaded library); this is
the throughput path for MPC/scenario/portfolio workloads.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from .. import solver as _solver
from ..cones import api
from ..cones.layout import ConeLayout
from ..infbound import get_infinity
from ..settings import DefaultSettings
from ..statuses import SolverStatus


@dataclasses.dataclass
class BatchSolution:
    """Stacked solutions for a problem batch (leading axis = batch).

    Under a multi-process run (``jax.distributed``), each process holds
    only its addressable lanes: the arrays cover ``lanes`` (global batch
    indices, sorted ascending) instead of the full batch.  ``lanes`` is
    ``None`` in the ordinary single-process case, meaning all of
    ``0..B-1``.
    """

    x: np.ndarray
    z: np.ndarray
    s: np.ndarray
    status: np.ndarray  # int codes; map via SolverStatus(...)
    obj_val: np.ndarray
    obj_val_dual: np.ndarray
    iterations: np.ndarray
    r_prim: np.ndarray
    r_dual: np.ndarray
    solve_time: float
    lanes: Optional[np.ndarray] = None

    def statuses(self):
        return [SolverStatus(int(v)) for v in self.status]


def _gather_local(out):
    """``device_get`` that also works when the solve ran across processes.

    Single-process (fully addressable outputs): plain device_get, all
    lanes, ``lanes=None``.  Multi-process: a global array cannot be
    fetched whole (other processes hold the rest), so assemble this
    process's lanes from ``addressable_shards`` — the public-API analog
    of the per-rank shard checks in tests/_distributed_worker.py.
    """
    ref = out["status"]
    if getattr(ref, "is_fully_addressable", True):
        return jax.tree.map(np.asarray, jax.device_get(out)), None

    def localize(a):
        segs = {}
        for sh in a.addressable_shards:
            start = sh.index[0].start or 0
            segs.setdefault(start, np.asarray(sh.data))  # dedupe replicas
        return np.concatenate(
            [segs[k] for k in sorted(segs)], axis=0
        )

    lanes = np.concatenate(
        sorted(
            (
                np.arange(
                    sh.index[0].start or 0,
                    (sh.index[0].start or 0) + sh.data.shape[0],
                )
                for sh in {
                    (sh.index[0].start or 0): sh
                    for sh in ref.addressable_shards
                }.values()
            ),
            key=lambda r: r[0],
        )
    )
    return jax.tree.map(localize, out), lanes


class BatchSolver:
    """Solve a batch of structurally identical conic programs in one shot.

    P: [B, n, n], q: [B, n], A: [B, m, n], b: [B, m].  All instances share
    the cone layout.  The batch axis shards over ``mesh`` (a 1-D
    ``jax.sharding.Mesh``) when given; otherwise a mesh over all local
    devices of the target backend is used when the batch divides evenly.

    Semantics contract vs :class:`~clarabel_tpu.solver.DefaultSolver`
    (the deliberate divergences; everything else — statuses, tolerances,
    certificates, scaling strategies — is the same jitted core):

    - **No row-reduction presolve.** Presolve is value-dependent and would
      fragment the batch into per-instance shapes; b is capped at the
      infinity bound instead.  Identical results unless an instance has
      fully redundant rows, where the reference/DefaultSolver may converge
      in different iteration counts (statuses still agree on all oracle
      problems).
    - **No chordal decomposition** (shape-changing, PSD-specific).
    - **No termination callbacks and no wall-clock time limit** — a host
      callback would serialize the vmapped loop; MaxIterations bounds the
      batch instead.
    - **Per-lane freezing**: converged instances stop updating while the
      batch runs to collective completion, so per-lane `iterations` are
      exact even though wall-clock is max-of-batch.
    """

    def __init__(
        self,
        P,
        q,
        A,
        b,
        cones: Sequence[api.ConeSpec],
        settings: Optional[DefaultSettings] = None,
        dtype: Optional[str] = None,
        mesh: Optional[Mesh] = None,
        device=None,
    ):
        self.settings = settings if settings is not None else DefaultSettings()
        self.settings.validate()

        q = np.asarray(q, np.float64)
        b = np.asarray(b, np.float64)
        P = np.asarray(P, np.float64)
        A = np.asarray(A, np.float64)
        if q.ndim != 2:
            raise ValueError("batched q must be [B, n]")
        B, n = q.shape
        m = b.shape[1]
        if P.shape != (B, n, n) or A.shape != (B, m, n) or b.shape != (B, m):
            raise ValueError("inconsistent batch shapes")

        cones = tuple(cones)
        if sum(c.nvars for c in cones) != m:
            raise ValueError("cone dims do not match b")

        # symmetrize-by-triu per instance (matches DefaultSolver semantics)
        U = np.triu(P)
        P = U + np.transpose(np.triu(P, 1), (0, 2, 1))

        # NB: row-reduction presolve is value-dependent and would fragment
        # the batch into different shapes; batch mode caps b at the infinity
        # bound instead (equivalent unless rows are fully redundant).
        b = np.minimum(b, get_infinity())

        cones_int = api.collapse_cones(cones)
        self._layout = ConeLayout(cones_int)
        perm = self._layout.perm
        A = A[:, perm, :]
        b = b[:, perm]

        self.B, self.n, self.m = B, n, m
        self._dtype = dtype or _solver._default_dtype()
        self._p_is_zero = not np.any(P)

        if device is None and mesh is None:
            device = (
                jax.devices("cpu")[0] if self._dtype == "float64" else jax.devices()[0]
            )

        target = mesh.devices.flat[0] if mesh is not None else device
        use_pallas = _solver._is_tpu_platform(target)

        core = _solver.build_solve_core(
            self._layout, self.settings, n, self._p_is_zero, self._dtype,
            use_pallas=use_pallas,
        )
        batched = jax.vmap(core)

        self._core_args = dict(
            layout=self._layout, settings=self.settings, n=n,
            p_is_zero=self._p_is_zero, dtype_name=self._dtype,
            use_pallas=use_pallas,
        )
        self._warm_fn = None
        self._device = device

        if mesh is not None:
            self._mesh = mesh
            axis = mesh.axis_names[0]
            if len(mesh.axis_names) == 2:
                # 2-D (batch x rows) mesh: the batch dimension shards over
                # the first axis and the constraint rows of A/b over the
                # second — the scenario-batch x Schur-partition product
                # (SURVEY §2.9 / §5.8); P stays replicated along rows
                raxis = mesh.axis_names[1]
                shardings = (
                    NamedSharding(mesh, PSpec(axis, None, None)),   # P
                    NamedSharding(mesh, PSpec(axis, None)),         # q
                    NamedSharding(mesh, PSpec(axis, raxis, None)),  # A
                    NamedSharding(mesh, PSpec(axis, raxis)),        # b
                )
                self._solve_fn = jax.jit(batched, in_shardings=shardings)
                puts = [
                    lambda v, s=s: jax.device_put(np.asarray(v, self._dtype), s)
                    for s in shardings
                ]
                self._P, self._q, self._A, self._b = (
                    puts[0](P), puts[1](q), puts[2](A), puts[3](b)
                )
                self._put = puts[1]
                return
            data_sharding = NamedSharding(mesh, PSpec(axis))
            self._solve_fn = jax.jit(
                batched,
                in_shardings=(
                    NamedSharding(mesh, PSpec(axis, None, None)),
                    data_sharding,
                    NamedSharding(mesh, PSpec(axis, None, None)),
                    data_sharding,
                ),
            )
            put = lambda v: jax.device_put(
                np.asarray(v, self._dtype),
                NamedSharding(mesh, PSpec(*([axis] + [None] * (v.ndim - 1)))),
            )
        else:
            self._mesh = None
            self._solve_fn = jax.jit(batched)
            put = lambda v: jax.device_put(np.asarray(v, self._dtype), device)

        self._P = put(P)
        self._q = put(q)
        self._A = put(A)
        self._b = put(b)
        self._put = put

    # ------------------------------------------------------------------
    def solve(self, warm_start=None) -> BatchSolution:
        """Solve the batch.  ``warm_start`` is a previous
        :class:`BatchSolution` or an (x, s, z) triple of [B, ...] arrays
        used as initial iterates per lane (MPC/scenario re-solve loops)."""
        t0 = time.perf_counter()
        if warm_start is not None:
            out = self._solve_warm(warm_start)
        else:
            out = self._solve_fn(self._P, self._q, self._A, self._b)
        out, lanes = _gather_local(out)
        solve_time = time.perf_counter() - t0

        # undo the cone permutation per instance
        iperm = self._layout.iperm
        z = out["z"][:, iperm]
        s = out["s"][:, iperm]

        self._last_out = out
        return BatchSolution(
            x=out["x"],
            z=z,
            s=s,
            status=out["status"],
            obj_val=out["obj_val"],
            obj_val_dual=out["obj_val_dual"],
            iterations=out["iterations"],
            r_prim=out["r_prim"],
            r_dual=out["r_dual"],
            solve_time=solve_time,
            lanes=lanes,
        )

    def _solve_warm(self, warm_start):
        if isinstance(warm_start, BatchSolution):
            x0, s0, z0 = warm_start.x, warm_start.s, warm_start.z
        else:
            x0, s0, z0 = warm_start
        x0 = np.asarray(x0, np.float64)
        s0 = np.asarray(s0, np.float64)
        z0 = np.asarray(z0, np.float64)
        if x0.shape != (self.B, self.n) or s0.shape != (self.B, self.m):
            raise ValueError("warm start has wrong batch dimensions")

        if self._warm_fn is None:
            core = _solver.build_solve_core(warm=True, **self._core_args)
            self._warm_fn = jax.jit(jax.vmap(core))

        perm = self._layout.perm
        return self._warm_fn(
            self._P, self._q, self._A, self._b,
            self._put(x0), self._put(s0[:, perm]), self._put(z0[:, perm]),
        )

    def iteration_history(self):
        """Per-lane progress tables [B, max_iter+1, 9] from the last solve
        (columns: pcost, dcost, gap_abs, gap_rel, pres, dres, k/t, μ, step)."""
        if not hasattr(self, "_last_out"):
            raise ValueError("no solve has been run yet")
        return np.asarray(self._last_out["history"])
