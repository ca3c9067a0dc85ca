"""Equality-constrained and unconstrained oracles
(reference: tests/basic_eq_constrained.rs, tests/basic_unconstrained.rs)."""

import numpy as np

import clarabel_tpu as ct


def settings():
    return ct.DefaultSettings(verbose=False)


A1 = np.array([[0.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
A2 = np.array(
    [
        [0.0, 1.0, 1.0],
        [0.0, 1.0, -1.0],
        [1.0, 2.0, -1.0],
        [2.0, -1.0, 3.0],
    ]
)


def test_eq_constrained_feasible():
    solver = ct.DefaultSolver(
        np.eye(3), np.zeros(3), A1, [2.0, 0.0], [ct.ZeroConeT(2)], settings()
    )
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - np.array([0.0, 1.0, 1.0])) <= 1e-6


def test_eq_constrained_primal_infeasible():
    solver = ct.DefaultSolver(
        np.eye(3), np.zeros(3), A2, np.ones(4), [ct.ZeroConeT(4)], settings()
    )
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.PrimalInfeasible


def test_eq_constrained_dual_infeasible():
    P = np.eye(3)
    P[0, 0] = 0.0
    solver = ct.DefaultSolver(
        P, np.ones(3), A1, [2.0, 0.0], [ct.ZeroConeT(2)], settings()
    )
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.DualInfeasible


def test_unconstrained_feasible():
    q = np.array([1.0, 2.0, -3.0])
    solver = ct.DefaultSolver(
        np.eye(3), q, np.zeros((0, 3)), np.zeros(0), [], settings()
    )
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - (-q)) <= 1e-6


def test_unconstrained_dual_infeasible():
    solver = ct.DefaultSolver(
        np.zeros((3, 3)),
        np.array([1.0, 0.0, 0.0]),
        np.zeros((0, 3)),
        np.zeros(0),
        [],
        settings(),
    )
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.DualInfeasible
