"""Equilibration bounds oracle (reference: tests/equilibration_bounds.rs)."""

import numpy as np

import clarabel_tpu as ct


def equil_data():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    A1 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A = np.vstack([-A1, A1])
    q = np.array([1.0, 1.0])
    b = np.array([-1.0, 0.0, 0.0, 1.0, 0.7, 0.7])
    cones = [ct.NonnegativeConeT(3), ct.NonnegativeConeT(3)]
    return P, q, A, b, cones


def test_equilibrate_lower_bound():
    P, q, A, b, cones = equil_data()
    P[0, 0] = 1e-15
    s = ct.DefaultSettings(verbose=False)
    solver = ct.DefaultSolver(P, q, A, b, cones, s)
    solver.solve()

    eq = solver.equilibration
    assert eq.d.min() >= s.equilibrate_min_scaling
    assert eq.e.min() >= s.equilibrate_min_scaling
    assert eq.d.max() <= s.equilibrate_max_scaling
    assert eq.e.max() <= s.equilibrate_max_scaling


def test_equilibrate_upper_bound():
    P, q, A, b, cones = equil_data()
    A[0, 0] = 1e15
    s = ct.DefaultSettings(verbose=False, max_iter=10)
    solver = ct.DefaultSolver(P, q, A, b, cones, s)
    sol = solver.solve()

    eq = solver.equilibration
    assert eq.d.min() >= s.equilibrate_min_scaling
    assert eq.e.min() >= s.equilibrate_min_scaling
    assert eq.d.max() <= s.equilibrate_max_scaling
    assert eq.e.max() <= s.equilibrate_max_scaling

    # poorly scaled problem within 10 iterations
    assert sol.status == ct.SolverStatus.MaxIterations


def test_equilibrate_zero_rows():
    P, q, A, b, cones = equil_data()
    A[:] = 0.0
    solver = ct.DefaultSolver(P, q, A, b, cones, ct.DefaultSettings(verbose=False))
    solver.solve()

    assert np.all(solver.equilibration.e == 1.0)
