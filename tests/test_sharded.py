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


def test_sharded_rejects_indivisible_rows():
    devices = jax.devices("cpu")
    mesh = Mesh(np.array(devices[:8]), ("rows",))
    P, q, A, b, cones = tall_problem(m=100)
    cones = [ct.NonnegativeConeT(100)]
    with pytest.raises(ValueError):
        ct.ShardedRowSolver(P, q, A, b, cones, settings(), mesh=mesh)
