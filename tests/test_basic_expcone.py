"""Exponential cone oracle (reference: tests/basic_expcone.rs)."""

import numpy as np

import clarabel_tpu as ct


def expcone_data():
    # max x  s.t.  y*exp(x/y) <= z, y == 1, z == exp(5)
    P = np.zeros((3, 3))
    q = np.array([-1.0, 0.0, 0.0])
    A = np.vstack(
        [-np.eye(3), np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])]
    )
    b = np.concatenate([np.zeros(3), [1.0, np.exp(5.0)]])
    cones = [ct.ExponentialConeT(), ct.ZeroConeT(2)]
    return P, q, A, b, cones


def settings():
    return ct.DefaultSettings(verbose=False)


def test_expcone_feasible():
    P, q, A, b, cones = expcone_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    refsol = np.array([5.0, 1.0, np.exp(5.0)])
    assert np.linalg.norm(sol.x - refsol) <= 1e-6
    assert abs(solver.info.cost_primal - (-5.0)) <= 1e-6


def test_expcone_primal_infeasible():
    P, q, A, b, cones = expcone_data()
    b[4] = -1.0
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.PrimalInfeasible


def test_expcone_dual_infeasible():
    P = np.zeros((3, 3))
    q = np.array([-1.0, 0.0, 0.0])
    A = -np.eye(3)
    b = np.zeros(3)
    cones = [ct.ExponentialConeT()]
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.DualInfeasible
