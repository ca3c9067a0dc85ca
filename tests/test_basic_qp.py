"""QP test oracle: same problems / expected results as the reference suite
(reference: tests/basic_qp.rs)."""

import numpy as np
import pytest

import clarabel_tpu as ct


def qp_data():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    A1 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A = np.vstack([-A1, A1])
    q = np.array([1.0, 1.0])
    b = np.array([-1.0, 0.0, 0.0, 1.0, 0.7, 0.7])
    cones = [ct.NonnegativeConeT(3), ct.NonnegativeConeT(3)]
    return P, q, A, b, cones


def qp_data_dual_inf():
    P = np.array([[1.0, 1.0], [1.0, 1.0]])
    A = np.array([[1.0, 1.0], [1.0, 0.0]])
    q = np.array([1.0, -1.0])
    b = np.array([1.0, 1.0])
    cones = [ct.NonnegativeConeT(2)]
    return P, q, A, b, cones


def settings():
    return ct.DefaultSettings(verbose=False)


def test_qp_univariate():
    solver = ct.DefaultSolver(
        np.eye(1), [0.0], np.eye(1), [1.0], [ct.NonnegativeConeT(1)], settings()
    )
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert abs(sol.x[0]) <= 1e-6
    assert abs(sol.obj_val) <= 1e-6
    assert abs(sol.obj_val_dual) <= 1e-6


def test_qp_feasible():
    P, q, A, b, cones = qp_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - np.array([0.3, 0.7])) <= 1e-6
    refobj = 1.8800000298331538
    assert abs(sol.obj_val - refobj) <= 1e-6
    assert abs(sol.obj_val_dual - refobj) <= 1e-6


def test_qp_singleton_constraints():
    P, q, A, b, cones = qp_data()
    s1 = ct.DefaultSolver(P, q, A, b, cones, settings()).solve()

    cones2 = [ct.NonnegativeConeT(1)] * 6
    s2 = ct.DefaultSolver(P, q, A, b, cones2, settings()).solve()

    cones3 = [ct.SecondOrderConeT(1)] * 6
    s3 = ct.DefaultSolver(P, q, A, b, cones3, settings()).solve()

    assert s1.status == s2.status == s3.status
    assert s1.obj_val == s2.obj_val == s3.obj_val
    assert np.array_equal(s1.x, s2.x)
    assert np.array_equal(s1.x, s3.x)


def test_qp_primal_infeasible():
    P, q, A, b, cones = qp_data()
    b[0] = -1.0
    b[3] = -1.0
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.PrimalInfeasible
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)


def test_qp_dual_infeasible():
    P, q, A, b, cones = qp_data_dual_inf()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.DualInfeasible
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)


def test_qp_dual_infeasible_ill_cond():
    P, q, _, _, _ = qp_data_dual_inf()
    A = np.array([[1.0, 1.0]])
    b = np.array([1.0])
    cones = [ct.NonnegativeConeT(1)]
    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()

    assert sol.status == ct.SolverStatus.DualInfeasible
    assert np.isnan(sol.obj_val)
    assert np.isnan(sol.obj_val_dual)
