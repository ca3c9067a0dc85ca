"""Intra-problem row sharding over a device mesh."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

import clarabel_tpu as ct


def tall_problem(n=16, m=128, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n)) / np.sqrt(n)
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = np.abs(A @ rng.normal(size=n)) + 1.0
    return P, q, A, b, [ct.NonnegativeConeT(m)]


def settings():
    return ct.DefaultSettings(
        verbose=False,
        tol_gap_abs=1e-5, tol_gap_rel=1e-5, tol_feas=1e-5,
        tol_infeas_abs=1e-5, tol_infeas_rel=1e-5,
    )


def test_sharded_matches_single_device():
    devices = jax.devices("cpu")
    assert len(devices) >= 8
    mesh = Mesh(np.array(devices[:8]), ("rows",))

    P, q, A, b, cones = tall_problem()
    sharded = ct.ShardedRowSolver(P, q, A, b, cones, settings(), mesh=mesh)
    sol = sharded.solve()
    assert sol.status == ct.SolverStatus.Solved

    ref = ct.DefaultSolver(
        P, q, A, b, cones, settings(), dtype="float32", device=devices[0]
    ).solve()
    assert np.allclose(sol.x, ref.x, atol=1e-4)
    assert abs(sol.obj_val - ref.obj_val) <= 1e-4


def test_sharded_pads_indivisible_rows():
    """m not divisible by the mesh size pads with inert nonnegative rows
    and strips them from the returned solution."""
    devices = jax.devices("cpu")
    mesh = Mesh(np.array(devices[:8]), ("rows",))
    P, q, A, b, cones = tall_problem(m=100)
    sharded = ct.ShardedRowSolver(P, q, A, b, cones, settings(), mesh=mesh)
    assert sharded._row_pad == 4
    sol = sharded.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert sol.z.shape == (100,) and sol.s.shape == (100,)

    ref = ct.DefaultSolver(
        P, q, A, b, cones, settings(), dtype="float32", device=devices[0]
    ).solve()
    assert np.allclose(sol.x, ref.x, atol=1e-4)


def test_sharded_communication_pattern():
    """The row-sharded Schur path must run explicit shard_map collectives:
    the compiled HLO psums (all-reduce) the Gram/A'v reductions and never
    all-gathers A's full row dimension (SURVEY §5.8)."""
    devices = jax.devices("cpu")
    mesh = Mesh(np.array(devices[:8]), ("rows",))
    P, q, A, b, cones = tall_problem()
    sharded = ct.ShardedRowSolver(P, q, A, b, cones, settings(), mesh=mesh)
    assert sharded._explicit_collectives
    txt = (
        sharded._solve_fn
        .lower(sharded._P, sharded._q, sharded._A, sharded._b)
        .compile()
        .as_text()
    )
    assert txt.count("all-reduce") > 0
    m, n = A.shape
    full_a_gathers = [
        line for line in txt.splitlines()
        if "all-gather" in line and f"f32[{m},{n}]" in line
    ]
    assert not full_a_gathers


def tall_sparse_problem(n=48, m=100_000, seed=1):
    """Tall sparse box-constrained QP: bounds on random small row-subsets
    (~3 nnz/row).  Dense A would be m*n floats; sparse is ~3m."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    P = sp.diags(1.0 + rng.uniform(0, 1, n), format="csc")
    q = rng.normal(size=n)
    knz = 3
    rows = np.repeat(np.arange(m), knz)
    cols = rng.integers(0, n, m * knz)
    vals = rng.normal(size=m * knz)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(m, n))
    A.sum_duplicates()
    b = np.abs(A @ rng.normal(size=n)) + 1.0
    return P, q, A, b, [ct.NonnegativeConeT(m)]


def test_sharded_sparse_matches_dense_path():
    """scipy-sparse A through ShardedRowSolver (ELL row blocks) gives the
    same solution as the dense-input sharded path and as DefaultSolver."""
    import scipy.sparse as sp

    devices = jax.devices("cpu")
    mesh = Mesh(np.array(devices[:8]), ("rows",))
    P, q, A, b, cones = tall_problem(n=16, m=128)
    A_sp = sp.csr_matrix(np.where(np.abs(A) > 0.8, A, 0.0))
    A_d = A_sp.toarray()

    sparse = ct.ShardedRowSolver(P, q, A_sp, b, cones, settings(), mesh=mesh)
    assert sparse._sparse_A and sparse._explicit_collectives
    dense = ct.ShardedRowSolver(P, q, A_d, b, cones, settings(), mesh=mesh)
    assert not dense._sparse_A

    s1, s2 = sparse.solve(), dense.solve()
    assert s1.status == s2.status == ct.SolverStatus.Solved
    assert np.allclose(s1.x, s2.x, atol=1e-4)

    ref = ct.DefaultSolver(
        P, q, A_d, b, cones, settings(), dtype="float32",
        device=devices[0],
    ).solve()
    assert np.allclose(s1.x, ref.x, atol=1e-4)
    assert abs(s1.obj_val - ref.obj_val) <= 1e-4


def test_sharded_sparse_tall_no_dense_host_A():
    """A tall sparse problem (m = 1e5) row-shards without the host ever
    materializing dense A (VERDICT r4 #5), and the compiled HLO contains
    no all-gather of any m-sized operand."""
    import scipy.sparse as sp

    devices = jax.devices("cpu")
    mesh = Mesh(np.array(devices[:8]), ("rows",))
    P, q, A, b, cones = tall_sparse_problem()
    m, n = A.shape
    assert m >= 100_000

    # f32 run => f32-scaled regularization floors (CLAUDE.md / settings.py)
    solver = ct.ShardedRowSolver(
        P, q, A, b, cones, ct.DefaultSettings.for_float32(verbose=False),
        mesh=mesh,
    )
    assert solver._sparse_A and solver._explicit_collectives
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved

    # KKT conditions checked directly on the host against the sparse data
    # (a reference solve at this size would itself need the sparse engine)
    r_prim = np.linalg.norm(A @ sol.x + sol.s - b, np.inf)
    r_dual = np.linalg.norm(
        P @ sol.x + q + A.T @ sol.z, np.inf
    )
    scale = max(1.0, np.abs(b).max())
    assert r_prim <= 5e-4 * scale, r_prim
    assert r_dual <= 5e-4 * max(1.0, np.abs(q).max()), r_dual
    assert (sol.s >= -1e-5).all() and (sol.z >= -1e-5).all()

    txt = (
        solver._solve_fn
        .lower(solver._P, solver._q, solver._A, solver._b)
        .compile()
        .as_text()
    )
    assert txt.count("all-reduce") > 0
    # no all-gather of any A-shaped (2-D, m-row) operand: neither the ELL
    # arrays [m, knz] nor a dense [m, n] may ever be gathered.  (m-length
    # *vector* gathers — iterates crossing replicated/sharded boundaries —
    # are 4m bytes and fine.)
    bad = [
        line for line in txt.splitlines()
        if "all-gather" in line and (f"[{m}," in line or f",{m}]" in line)
    ]
    assert not bad, bad[:3]
