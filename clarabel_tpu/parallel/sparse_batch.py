"""Batched sparse solving: vmapped multifrontal IPM over shared structure.

MPC / SQP / scenario workloads solve many conic programs with the SAME
sparsity pattern (dynamics structure is fixed; only values change).  The
sparse multifrontal KKT engine is built from the *pattern alone*
(:mod:`clarabel_tpu.kkt.mf_symbolic`), so one symbolic analysis serves the
whole batch and the numeric factorization vmaps: fronts become [B, k, r, r]
tensors, scatter assembly and the levelized triangular sweeps batch
unchanged.  The reference has no analog (single-threaded library;
cf. SURVEY.md §2.9) — this composes its two scaling mechanisms (sparse KKT,
qdldl.rs:468-700) with the TPU's scenario-batch axis.

Semantics contract matches :class:`~clarabel_tpu.parallel.batch.BatchSolver`
(no presolve / chordal / callbacks / time limit; per-lane freeze), with the
sparse path's own rules: structure is immutable, values vary per lane.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from .. import solver as _solver
from ..algebra.coo import COOMat
from ..cones import api
from ..cones.layout import ConeLayout
from ..infbound import get_infinity
from ..settings import DefaultSettings
from .batch import BatchSolution


def _stack_same_structure(mats, name):
    """Canonicalize a list of scipy matrices with identical sparsity to
    (csc_pattern, data [B, nnz]).  Raises when patterns differ."""
    import scipy.sparse as sp

    first = mats[0].tocsc(copy=True)
    first.sort_indices()
    data = np.empty((len(mats), first.nnz), np.float64)
    data[0] = first.data
    for i, M in enumerate(mats[1:], 1):
        Mc = sp.csc_matrix(M, copy=True)
        Mc.sort_indices()
        if Mc.shape != first.shape or Mc.nnz != first.nnz or not (
            np.array_equal(Mc.indptr, first.indptr)
            and np.array_equal(Mc.indices, first.indices)
        ):
            raise ValueError(
                f"all {name} instances must share one sparsity pattern "
                f"(instance {i} differs); pad with explicit zeros"
            )
        data[i] = Mc.data
    return first, data


class SparseBatchSolver:
    """Solve a batch of sparse conic programs sharing one sparsity pattern.

    Parameters
    ----------
    P, A : sequence of scipy.sparse matrices (identical patterns), or a
        single scipy.sparse matrix used for every instance.
    q : [B, n]; b : [B, m].
    cones : shared cone specification.
    mesh : optional 1-D ``jax.sharding.Mesh``; the batch axis shards over it.

    One symbolic multifrontal analysis (ordering, supernodes, level
    schedule, scatter maps) is shared; the numeric factor/solve is vmapped
    over the batch and jitted as one XLA computation.
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
        import scipy.sparse as sp

        self.settings = settings if settings is not None else DefaultSettings()
        self.settings.validate()

        q = np.atleast_2d(np.asarray(q, np.float64))
        b = np.atleast_2d(np.asarray(b, np.float64))
        B, n = q.shape
        m = b.shape[1]
        if b.shape[0] != B:
            raise ValueError("q and b disagree on the batch size")

        if sp.issparse(P):
            P = [P] * B
        if sp.issparse(A):
            A = [A] * B
        if len(P) != B or len(A) != B:
            raise ValueError("P/A lists must have one matrix per instance")

        P0, P_data = _stack_same_structure(P, "P")
        A0, A_data = _stack_same_structure(A, "A")
        if P0.shape != (n, n) or A0.shape != (m, n):
            raise ValueError("P/A shapes do not match q/b")
        cones = tuple(cones)
        if sum(c.nvars for c in cones) != m:
            raise ValueError("cone dims do not match b")

        # --- host symbolic pipeline (pattern only, instance-independent) --
        # triu-symmetrize P with an explicit data map so every instance
        # rides the same deterministic COO order
        Pt = sp.triu(P0, format="csc")
        Pt.sort_indices()
        # map: position in P0's canonical CSC data -> kept-triu positions
        keep = np.zeros(P0.nnz, bool)
        rows_all = P0.indices
        cols_all = np.repeat(np.arange(n), np.diff(P0.indptr))
        keep[rows_all <= cols_all] = True
        triu_src = np.where(keep)[0]
        tr = Pt.tocoo()
        strict = tr.row != tr.col
        sym_rows = np.concatenate([tr.row, tr.col[strict]]).astype(np.int64)
        sym_cols = np.concatenate([tr.col, tr.row[strict]]).astype(np.int64)
        sym_src = np.concatenate([triu_src, triu_src[strict]])
        self._sym_src = sym_src
        self._P_nnz = P0.nnz
        P_sym_data = P_data[:, sym_src]
        self._p_is_zero = not np.any(P_sym_data)

        # no presolve in batch mode (value-dependent; see BatchSolver):
        # cap b at the infinity bound instead
        b = np.minimum(b, get_infinity())

        cones_int = api.collapse_cones(cones)
        self._layout = ConeLayout(cones_int)
        perm = self._layout.perm

        # cone-permute A rows once on the pattern, with a data map so the
        # per-instance values follow
        tmp = A0.copy()  # canonical CSC frame
        tmp.data = np.arange(A0.nnz, dtype=np.float64)
        A_perm = tmp.tocsr()[perm].tocoo()
        a_src = np.rint(A_perm.data).astype(np.int64)
        self._a_src = a_src
        A_perm_data = A_data[:, a_src]
        b = b[:, perm]

        from ..kkt import sparse as kkt_sparse

        self._skkt = kkt_sparse.build(
            self._layout, n,
            sym_rows, sym_cols,
            A_perm.row.astype(np.int64), A_perm.col.astype(np.int64),
            ordering=self.settings.multifrontal_ordering,
            dtype=dtype or _solver._default_dtype(),
        )

        self.B, self.n, self.m = B, n, m
        self._dtype = dtype or _solver._default_dtype()

        if device is None and mesh is None:
            device = (
                jax.devices("cpu")[0]
                if self._dtype == "float64"
                else jax.devices()[0]
            )
        self._device = device
        self._mesh = mesh

        core = _solver.build_solve_core(
            self._layout, self.settings, n, self._p_is_zero, self._dtype,
            sparse_ctx=self._skkt,
        )
        # batch the numeric leaves only: COO values, q, b; structure
        # (rows/cols, dia maps, index-map pytree) is shared across lanes.
        # DIA metadata rides along so per-lane residual matvecs vmap into
        # batched static shifts (predia runs per lane inside the core).
        from ..algebra.coo import dia_metadata

        P_dia = dia_metadata(sym_rows, sym_cols, (n, n))
        A_dia = dia_metadata(A_perm.row, A_perm.col, (self.m, n))

        def coo_axes(M):
            # axes pytree matching M's structure: batch only the values
            leaves, treedef = jax.tree_util.tree_flatten(M)
            axes = [0 if leaf is M.data else None for leaf in leaves]
            return jax.tree_util.tree_unflatten(treedef, axes)

        self._warm_fn = None
        self._core_args = dict(
            layout=self._layout, settings=self.settings, n=n,
            p_is_zero=self._p_is_zero, dtype_name=self._dtype,
            sparse_ctx=self._skkt,
        )

        if mesh is not None:
            axis = mesh.axis_names[0]
            bsh = NamedSharding(mesh, PSpec(axis))
            rep = NamedSharding(mesh, PSpec())
            put_b = lambda v: jax.device_put(np.asarray(v, self._dtype), bsh)
            put_r = lambda v: jax.device_put(np.asarray(v), rep)
            target = None
        else:
            put_b = lambda v: jax.device_put(np.asarray(v, self._dtype), device)
            put_r = lambda v: jax.device_put(np.asarray(v), device)
            target = device

        iput = lambda v: put_r(np.asarray(v, np.int32))
        self._P = COOMat(
            put_b(P_sym_data), iput(sym_rows), iput(sym_cols), (n, n),
            dia_pos=None if P_dia[1] is None else put_r(P_dia[1]),
            dia_offsets=P_dia[0],
        )
        self._A = COOMat(
            put_b(A_perm_data), iput(A_perm.row), iput(A_perm.col),
            (self.m, n),
            dia_pos=None if A_dia[1] is None else put_r(A_dia[1]),
            dia_offsets=A_dia[0],
        )
        in_axes = (coo_axes(self._P), 0, coo_axes(self._A), 0, None)
        self._in_axes = in_axes
        self._solve_fn = jax.jit(jax.vmap(core, in_axes=in_axes))
        self._q = put_b(q)
        self._b = put_b(b)
        self._skkt_data = self._skkt.device_data(self._dtype, target)
        if mesh is not None:
            self._skkt_data = {
                k: jax.device_put(v, NamedSharding(mesh, PSpec()))
                for k, v in self._skkt_data.items()
            }
        self._put_b = put_b

    # ------------------------------------------------------------------
    @property
    def plan(self):
        """The shared multifrontal plan (for introspection/testing)."""
        return self._skkt.plan

    def solve(self, warm_start=None) -> BatchSolution:
        """Solve the batch; ``warm_start`` is a previous
        :class:`BatchSolution` or an (x, s, z) triple of [B, ...] arrays."""
        t0 = time.perf_counter()
        if warm_start is not None:
            out = self._solve_warm(warm_start)
        else:
            out = self._solve_fn(
                self._P, self._q, self._A, self._b, self._skkt_data
            )
        out = jax.tree.map(np.asarray, jax.device_get(out))
        solve_time = time.perf_counter() - t0

        iperm = self._layout.iperm
        self._last_out = out
        return BatchSolution(
            x=out["x"],
            z=out["z"][:, iperm],
            s=out["s"][:, iperm],
            status=out["status"],
            obj_val=out["obj_val"],
            obj_val_dual=out["obj_val_dual"],
            iterations=out["iterations"],
            r_prim=out["r_prim"],
            r_dual=out["r_dual"],
            solve_time=solve_time,
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
            self._warm_fn = jax.jit(
                jax.vmap(core, in_axes=self._in_axes + (0, 0, 0))
            )
        perm = self._layout.perm
        return self._warm_fn(
            self._P, self._q, self._A, self._b, self._skkt_data,
            self._put_b(x0), self._put_b(s0[:, perm]),
            self._put_b(z0[:, perm]),
        )

    def update_values(self, P_data=None, q=None, A_data=None, b=None):
        """Replace per-instance numeric values in place (structure is
        immutable — the sparse-path analog of the reference's
        update_data nzval forms, data_updating.rs:98-160).  ``P_data`` /
        ``A_data`` are [B, nnz] in the canonical sorted-CSC data order of
        the setup matrices (full P; the triu-symmetrize map is re-applied
        here)."""
        if P_data is not None:
            P_data = np.asarray(P_data, np.float64)
            if P_data.shape != (self.B, self._P_nnz):
                raise ValueError("P_data must be [B, nnz(P)] in CSC order")
            self._P = self._P.with_data(
                self._put_b(P_data[:, self._sym_src])
            )
        if A_data is not None:
            A_data = np.asarray(A_data, np.float64)
            if A_data.shape != (self.B, self._a_src.shape[0]):
                raise ValueError("A_data must be [B, nnz(A)] in CSC order")
            self._A = self._A.with_data(
                self._put_b(A_data[:, self._a_src])
            )
        if q is not None:
            self._q = self._put_b(np.asarray(q, np.float64))
        if b is not None:
            b = np.minimum(np.asarray(b, np.float64), get_infinity())
            self._b = self._put_b(b[:, self._layout.perm])

    def iteration_history(self):
        """[B, max_iter+1, 9] per-lane progress tables from the last solve."""
        if not hasattr(self, "_last_out"):
            raise ValueError("no solve has been run yet")
        return np.asarray(self._last_out["history"])
