"""Batched (vmapped) solver tests, including sharding over a virtual
8-device CPU mesh."""

import numpy as np
import jax
from jax.sharding import Mesh

import clarabel_tpu as ct


def qp_batch(B, seed=0):
    """B random strictly convex QPs with box constraints (always solvable)."""
    rng = np.random.default_rng(seed)
    n = 4
    M = rng.normal(size=(B, n, n))
    P = np.einsum("bij,bkj->bik", M, M) + 0.5 * np.eye(n)
    q = rng.normal(size=(B, n))
    A = np.tile(np.vstack([np.eye(n), -np.eye(n)]), (B, 1, 1))
    b = np.ones((B, 2 * n))
    cones = [ct.NonnegativeConeT(2 * n)]
    return P, q, A, b, cones


def test_batch_matches_single():
    B = 5
    P, q, A, b, cones = qp_batch(B)
    batch = ct.BatchSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))
    bs = batch.solve()

    for i in range(B):
        s = ct.DefaultSolver(
            P[i], q[i], A[i], b[i], cones, ct.DefaultSettings(verbose=False)
        ).solve()
        assert bs.statuses()[i] == s.status == ct.SolverStatus.Solved
        assert np.allclose(bs.x[i], s.x, atol=1e-7)
        assert abs(bs.obj_val[i] - s.obj_val) <= 1e-7


def test_batch_sharded_over_mesh():
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "conftest should provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devices[:8]), ("batch",))

    B = 16
    P, q, A, b, cones = qp_batch(B, seed=1)
    batch = ct.BatchSolver(
        P, q, A, b, cones, ct.DefaultSettings(verbose=False), mesh=mesh
    )
    bs = batch.solve()
    assert all(st == ct.SolverStatus.Solved for st in bs.statuses())

    # spot check one instance against the single-problem path
    s = ct.DefaultSolver(
        P[3], q[3], A[3], b[3], cones, ct.DefaultSettings(verbose=False)
    ).solve()
    assert np.allclose(bs.x[3], s.x, atol=1e-7)


def test_batch_mixed_statuses():
    # one feasible LP and one primal-infeasible LP in the same batch
    n = 3
    P = np.zeros((2, n, n))
    q = np.tile(np.array([3.0, -2.0, 1.0]), (2, 1))
    A = np.tile(2.0 * np.vstack([np.eye(3), -np.eye(3)]), (2, 1, 1))
    b = np.ones((2, 6))
    b[1, 0] = -1.0
    b[1, 3] = -1.0
    cones = [ct.NonnegativeConeT(6)]

    bs = ct.BatchSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False)).solve()
    assert bs.statuses()[0] == ct.SolverStatus.Solved
    assert bs.statuses()[1] == ct.SolverStatus.PrimalInfeasible
    assert np.isnan(bs.obj_val[1])


def test_batch_warm_start():
    B = 4
    P, q, A, b, cones = qp_batch(B, seed=7)
    batch = ct.BatchSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))
    cold = batch.solve()
    assert all(s == ct.SolverStatus.Solved for s in cold.statuses())

    warm = batch.solve(warm_start=cold)
    assert all(s == ct.SolverStatus.Solved for s in warm.statuses())
    assert np.allclose(warm.x, cold.x, atol=1e-6)
    assert (warm.iterations <= cold.iterations).all()

    hist = batch.iteration_history()
    assert hist.shape[0] == B and hist.shape[2] == 9
