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
