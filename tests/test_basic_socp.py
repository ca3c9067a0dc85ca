"""SOCP test oracle (reference: tests/basic_socp.rs)."""

import numpy as np

import clarabel_tpu as ct


def socp_data():
    P = np.array(
        [
            [1.4652521089139698, 0.6137176286085666, -1.1527861771130112],
            [0.6137176286085666, 2.219109946678485, -1.4400420548730628],
            [-1.1527861771130112, -1.4400420548730628, 1.6014483534926371],
        ]
    )
    A = np.vstack([2.0 * np.eye(3), -2.0 * np.eye(3), np.eye(3)])
    q = np.array([0.1, -2.0, 1.0])
    b = np.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    cones = [
        ct.NonnegativeConeT(3),
        ct.NonnegativeConeT(3),
        ct.SecondOrderConeT(3),
    ]
    return P, q, A, b, cones


def settings():
    return ct.DefaultSettings(verbose=False)


def test_socp_feasible():
    P, q, A, b, cones = socp_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - np.array([-0.5, 0.435603, -0.245459])) <= 1e-4
    refobj = -8.4590e-01
    assert abs(sol.obj_val - refobj) <= 1e-4
    assert abs(sol.obj_val_dual - refobj) <= 1e-4


def test_socp_feasible_mixed_dims():
    # same data but a single 6-dim SOC (the reference uses this to cover its
    # sparse rank-2 expansion; here it covers heterogeneous segment dims)
    P, q, A, b, _ = socp_data()
    cones = [ct.NonnegativeConeT(3), ct.SecondOrderConeT(6)]
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved


def test_socp_infeasible():
    P, q, A, b, cones = socp_data()
    b[6] = -10.0
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.PrimalInfeasible
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)
