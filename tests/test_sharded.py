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
