"""Power / generalized power cone oracles
(reference: tests/basic_powcone.rs, tests/basic_genpowcone.rs)."""

import numpy as np

import clarabel_tpu as ct


def _pow_problem(cones1):
    # max x1^0.6 y^0.4 + x2^0.1  s.t. x1,y,x2 >= 0, x1 + 2y + 3x2 == 3
    n = 6
    P = np.zeros((n, n))
    q = np.array([0.0, 0.0, -1.0, 0.0, 0.0, -1.0])
    A = np.vstack(
        [
            -np.eye(n),
            np.array([[1.0, 2.0, 0.0, 3.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0, 1.0, 0.0]]),
        ]
    )
    b = np.concatenate([np.zeros(n), [3.0, 1.0]])
    cones = cones1 + [ct.ZeroConeT(2)]
    return P, q, A, b, cones


def settings():
    return ct.DefaultSettings(verbose=False)


def test_powcone():
    P, q, A, b, cones = _pow_problem([ct.PowerConeT(0.6), ct.PowerConeT(0.1)])
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert abs(solver.info.cost_primal - (-1.8458)) <= 1e-3


def test_genpowcone():
    P, q, A, b, cones = _pow_problem(
        [ct.GenPowerConeT([0.6, 0.4], 1), ct.GenPowerConeT([0.1, 0.9], 1)]
    )
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert abs(solver.info.cost_primal - (-1.8458)) <= 1e-3


def test_powcone_primal_infeasible():
    """Power cone requires x1 >= 0; forcing x1 = -1 certificates primal
    infeasibility (mirrors the reference's per-cone infeasible triples,
    e.g. basic_expcone.rs:43-110)."""
    P = np.zeros((3, 3))
    q = np.zeros(3)
    A = np.vstack([-np.eye(3), [[1.0, 0.0, 0.0]]])
    b = np.array([0.0, 0.0, 0.0, -1.0])
    cones = [ct.PowerConeT(0.5), ct.ZeroConeT(1)]
    sol = ct.DefaultSolver(P, q, A, b, cones,
                           ct.DefaultSettings(verbose=False)).solve()
    assert sol.status == ct.SolverStatus.PrimalInfeasible


def test_powcone_dual_infeasible():
    """max x3 over the whole power cone is unbounded (cone is scale
    invariant): dual infeasibility certificate."""
    P = np.zeros((3, 3))
    q = np.array([0.0, 0.0, -1.0])
    A = -np.eye(3)
    b = np.zeros(3)
    cones = [ct.PowerConeT(0.5)]
    sol = ct.DefaultSolver(P, q, A, b, cones,
                           ct.DefaultSettings(verbose=False)).solve()
    assert sol.status == ct.SolverStatus.DualInfeasible


def test_genpowcone_primal_infeasible():
    P = np.zeros((4, 4))
    q = np.zeros(4)
    A = np.vstack([-np.eye(4), [[1.0, 0.0, 0.0, 0.0]]])
    b = np.array([0.0, 0.0, 0.0, 0.0, -1.0])
    cones = [ct.GenPowerConeT([0.5, 0.5], 2), ct.ZeroConeT(1)]
    sol = ct.DefaultSolver(P, q, A, b, cones,
                           ct.DefaultSettings(verbose=False)).solve()
    assert sol.status == ct.SolverStatus.PrimalInfeasible


def test_genpowcone_dual_infeasible():
    P = np.zeros((4, 4))
    q = np.array([0.0, 0.0, -1.0, 0.0])
    A = -np.eye(4)
    b = np.zeros(4)
    cones = [ct.GenPowerConeT([0.5, 0.5], 2)]
    sol = ct.DefaultSolver(P, q, A, b, cones,
                           ct.DefaultSettings(verbose=False)).solve()
    assert sol.status == ct.SolverStatus.DualInfeasible
