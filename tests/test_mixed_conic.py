"""Mixed symmetric/asymmetric cone oracle (reference: tests/mixed_conic.rs)."""

import numpy as np

import clarabel_tpu as ct


def test_mixed_conic_feasible():
    n = 3
    P = np.eye(n)
    q = np.ones(n)
    A = np.vstack([np.eye(n)] * 5)
    b = np.zeros(5 * n)
    cones = [
        ct.ZeroConeT(3),
        ct.NonnegativeConeT(3),
        ct.SecondOrderConeT(3),
        ct.PowerConeT(0.5),
        ct.ExponentialConeT(),
    ]

    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert abs(solver.info.cost_primal) <= 1e-8

    # re-solve forcing dual-only scaling via a huge switch threshold
    # (exercises the barrier backtracking path)
    solver2 = ct.DefaultSolver(
        P, q, A, b, cones,
        ct.DefaultSettings(verbose=False, min_switch_step_length=0.999),
    )
    sol2 = solver2.solve()
    assert sol2.status == ct.SolverStatus.Solved
    assert abs(solver2.info.cost_primal) <= 1e-8
