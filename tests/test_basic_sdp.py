"""SDP test oracle (reference: tests/basic_sdp.rs)."""

import numpy as np

import clarabel_tpu as ct


def sdp_data():
    P = np.eye(6)
    A = np.eye(6)
    q = np.zeros(6)
    b = np.array([-3.0, 1.0, 4.0, 1.0, 2.0, 5.0])
    cones = [ct.PSDTriangleConeT(3)]
    return P, q, A, b, cones


REFSOL = np.array(
    [
        -3.0729833267361095,
        0.3696004167288786,
        -0.022226685581313674,
        0.31441213129613066,
        -0.026739700851545107,
        -0.016084530571308823,
    ]
)
REFOBJ = 4.840076866013861


def settings():
    return ct.DefaultSettings(verbose=False)


def test_sdp_feasible():
    P, q, A, b, cones = sdp_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - REFSOL) <= 1e-6
    assert abs(solver.info.cost_primal - REFOBJ) <= 1e-6


def test_sdp_empty_cone():
    P, q, A, b, cones = sdp_data()
    cones = cones + [ct.PSDTriangleConeT(0)]
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - REFSOL) <= 1e-6
    assert abs(solver.info.cost_primal - REFOBJ) <= 1e-6


def test_sdp_primal_infeasible():
    P, q, A, b, cones = sdp_data()
    A = np.vstack([A, -A])
    b = np.concatenate([b, np.zeros(6)])
    cones = cones + [ct.PSDTriangleConeT(3)]
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.PrimalInfeasible


def test_sdp_mixed_with_soc():
    # PSD + SOC mixture (fresh coverage beyond the reference suite):
    # b is 5·I in svec form, so x = 0 is strictly feasible for both blocks
    P, q, A, b, cones = sdp_data()
    q = np.ones(6)
    b = np.array([5.0, 0.0, 5.0, 0.0, 0.0, 5.0])
    A = np.vstack([A, -np.eye(6)])
    b = np.concatenate([b, np.zeros(6)])
    cones = cones + [ct.SecondOrderConeT(6)]
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
