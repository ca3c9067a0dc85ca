"""LP test oracle: same problems / expected results as the reference suite
(reference: tests/basic_lp.rs)."""

import numpy as np
import pytest

import clarabel_tpu as ct


def lp_data():
    P = np.zeros((3, 3))
    A = 2.0 * np.vstack([np.eye(3), -np.eye(3)])
    q = np.array([3.0, -2.0, 1.0])
    b = np.ones(6)
    cones = [ct.NonnegativeConeT(3), ct.NonnegativeConeT(3)]
    return P, q, A, b, cones


def settings():
    return ct.DefaultSettings(verbose=False)


def test_lp_feasible():
    P, q, A, b, cones = lp_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - np.array([-0.5, 0.5, -0.5])) <= 1e-8
    assert abs(sol.obj_val - (-3.0)) <= 1e-8
    assert abs(sol.obj_val_dual - (-3.0)) <= 1e-8


def test_lp_primal_infeasible():
    P, q, A, b, cones = lp_data()
    b[0] = -1.0
    b[3] = -1.0
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.PrimalInfeasible
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)


def test_lp_dual_infeasible():
    P, _, A, b, cones = lp_data()
    # swap lower bound on first variable to a redundant upper bound
    # (the reference edits CSC nzval[1], i.e. the (3, 0) entry)
    A[3, 0] = 1.0
    q = np.array([1.0, 0.0, 0.0])
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.DualInfeasible
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)


def test_lp_dual_infeasible_ill_cond():
    P, _, A, b, cones = lp_data()
    # reference edits CSC nzval[0] -> (0,0) entry, nzval[1] -> (3,0) entry
    A[0, 0] = np.finfo(np.float64).eps
    A[3, 0] = 0.0
    q = np.array([1.0, 0.0, 0.0])
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.DualInfeasible
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)
