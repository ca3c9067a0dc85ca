"""f32 solve paths (the TPU configuration) validated on the CPU backend
with f32-appropriate tolerances."""

import numpy as np
import jax
import pytest

import clarabel_tpu as ct


def f32_settings(**kw):
    return ct.DefaultSettings(
        verbose=False,
        tol_gap_abs=1e-4, tol_gap_rel=1e-4, tol_feas=1e-4,
        tol_infeas_abs=1e-4, tol_infeas_rel=1e-4,
        iterative_refinement_abstol=1e-6, iterative_refinement_reltol=1e-7,
        **kw,
    )


def cpu():
    return jax.devices("cpu")[0]


def test_f32_qp_schur():
    P = np.array([[4.0, 1.0], [1.0, 2.0]])
    A1 = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    A = np.vstack([-A1, A1])
    q = np.array([1.0, 1.0])
    b = np.array([-1.0, 0.0, 0.0, 1.0, 0.7, 0.7])
    cones = [ct.NonnegativeConeT(6)]

    s = ct.DefaultSolver(
        P, q, A, b, cones, f32_settings(direct_solve_method="schur"),
        dtype="float32", device=cpu(),
    )
    sol = s.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - np.array([0.3, 0.7])) <= 1e-3


def test_f32_socp_schur():
    P = np.array(
        [
            [1.4652521089139698, 0.6137176286085666, -1.1527861771130112],
            [0.6137176286085666, 2.219109946678485, -1.4400420548730628],
            [-1.1527861771130112, -1.4400420548730628, 1.6014483534926371],
        ]
    )
    A = np.vstack([2.0 * np.eye(3), -2.0 * np.eye(3), np.eye(3)])
    q = np.array([0.1, -2.0, 1.0])
    b = np.array([1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    cones = [ct.NonnegativeConeT(6), ct.SecondOrderConeT(3)]

    # auto: SOC layouts pick the full quasidefinite (LU) factorization
    s = ct.DefaultSolver(
        P, q, A, b, cones, f32_settings(),
        dtype="float32", device=cpu(),
    )
    sol = s.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert abs(sol.obj_val - (-0.8459)) <= 1e-3


def test_f32_expcone():
    # exp cone with zero cone rows -> auto selects LU under f32
    P = np.zeros((3, 3))
    q = np.array([-1.0, 0.0, 0.0])
    A = np.vstack([-np.eye(3), np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])])
    b = np.concatenate([np.zeros(3), [1.0, np.exp(5.0)]])
    cones = [ct.ExponentialConeT(), ct.ZeroConeT(2)]

    s = ct.DefaultSolver(
        P, q, A, b, cones, f32_settings(), dtype="float32", device=cpu()
    )
    sol = s.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert abs(sol.x[0] - 5.0) <= 1e-2


def test_f32_infeasibility_certificate():
    P = np.zeros((3, 3))
    A = 2.0 * np.vstack([np.eye(3), -np.eye(3)])
    q = np.array([3.0, -2.0, 1.0])
    b = np.ones(6)
    b[0] = -1.0
    b[3] = -1.0
    cones = [ct.NonnegativeConeT(6)]

    s = ct.DefaultSolver(
        P, q, A, b, cones, f32_settings(), dtype="float32", device=cpu()
    )
    sol = s.solve()
    assert sol.status == ct.SolverStatus.PrimalInfeasible


def test_f32_eq_constrained_schur_diag():
    # equality rows ride the fast diagonal-Schur path via the delta proxy
    A1 = np.array([[0.0, 1.0, 1.0], [0.0, 1.0, -1.0]])
    A = np.vstack([A1, np.eye(3), -np.eye(3)])
    b = np.concatenate([[2.0, 0.0], 5 * np.ones(6)])
    cones = [ct.ZeroConeT(2), ct.NonnegativeConeT(6)]

    s = ct.DefaultSolver(
        np.eye(3), np.zeros(3), A, b, cones, f32_settings(),
        dtype="float32", device=cpu(),
    )
    sol = s.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert np.linalg.norm(sol.x - np.array([0.0, 1.0, 1.0])) <= 1e-3
