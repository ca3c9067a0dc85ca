"""Independent optimality verification on randomized problems.

Rather than trusting the solver's own convergence report, these tests check
the KKT conditions of returned solutions directly:

    primal feasibility:   A x + s = b,  s ∈ K
    dual   feasibility:   P x + q + Aᵀ z = 0,  z ∈ K*
    complementarity:      ⟨s, z⟩ ≈ 0
"""

import numpy as np
import pytest

import clarabel_tpu as ct


def settings():
    return ct.DefaultSettings(verbose=False)


def verify_kkt(P, q, A, b, sol, tol=1e-6):
    x, s, z = sol.x, sol.s, sol.z
    scale = 1.0 + max(np.abs(b).max(initial=0.0), np.abs(q).max(initial=0.0))
    assert np.linalg.norm(A @ x + s - b, np.inf) <= tol * scale
    assert np.linalg.norm(P @ x + q + A.T @ z, np.inf) <= tol * scale
    assert abs(s @ z) <= 10 * tol * scale


def check_cone_membership(s, z, cones, tol=1e-7):
    row = 0
    for cone in cones:
        w = cone.nvars
        ss, zz = s[row : row + w], z[row : row + w]
        if cone.kind == 1:  # NN (self dual)
            assert ss.min() >= -tol and zz.min() >= -tol
        elif cone.kind == 2:  # SOC (self dual)
            assert ss[0] + tol >= np.linalg.norm(ss[1:]) - tol
            assert zz[0] + tol >= np.linalg.norm(zz[1:]) - tol
        elif cone.kind == 0:  # zero cone: s = 0, z free
            assert np.abs(ss).max(initial=0.0) <= tol
        row += w


@pytest.mark.parametrize("seed", range(5))
def test_random_qp_kkt(seed):
    rng = np.random.default_rng(seed)
    n, m = 10, 25
    M = rng.normal(size=(n, n)) / np.sqrt(n)
    P = M @ M.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    # make strictly feasible: b = A x0 + margin
    b = A @ rng.normal(size=n) + rng.uniform(0.5, 1.5, m)
    cones = [ct.NonnegativeConeT(m)]

    sol = ct.DefaultSolver(P, q, A, b, cones, settings()).solve()
    assert sol.status == ct.SolverStatus.Solved
    verify_kkt(P, q, A, b, sol)
    check_cone_membership(sol.s, sol.z, ct.DefaultSolver(
        P, q, A, b, cones, settings())._cones_int)


@pytest.mark.parametrize("seed", range(3))
def test_random_mixed_cone_kkt(seed):
    rng = np.random.default_rng(100 + seed)
    n = 8
    M = rng.normal(size=(n, n)) / np.sqrt(n)
    P = M @ M.T + 0.2 * np.eye(n)
    q = rng.normal(size=n)

    # zero(2) + NN(6) + SOC(4)
    A_eq = rng.normal(size=(2, n))
    x_feas = rng.normal(size=n)
    b_eq = A_eq @ x_feas

    A_nn = rng.normal(size=(6, n))
    b_nn = A_nn @ x_feas + rng.uniform(0.5, 1.0, 6)

    A_soc = rng.normal(size=(4, n)) * 0.3
    s_soc = A_soc @ x_feas
    b_soc = s_soc.copy()
    b_soc[0] += np.linalg.norm(s_soc[1:] - b_soc[1:]) + 1.0  # strict interior

    A = np.vstack([A_eq, A_nn, A_soc])
    b = np.concatenate([b_eq, b_nn, b_soc])
    cones = [ct.ZeroConeT(2), ct.NonnegativeConeT(6), ct.SecondOrderConeT(4)]

    solver = ct.DefaultSolver(P, q, A, b, cones, settings())
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    verify_kkt(P, q, A, b, sol)
    check_cone_membership(sol.s, sol.z, solver._cones_int)


@pytest.mark.parametrize("seed", range(3))
def test_random_sdp_kkt(seed):
    rng = np.random.default_rng(200 + seed)
    n_mat = 4
    tri = n_mat * (n_mat + 1) // 2
    n = 5
    M = rng.normal(size=(n, n)) / np.sqrt(n)
    P = M @ M.T + 0.2 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(tri, n)) * 0.3
    # b = A x0 + svec(I) margin -> strictly feasible
    b = A @ rng.normal(size=n)
    diag_pos = [j * (j + 1) // 2 + j for j in range(n_mat)]
    b[diag_pos] += 2.0

    cones = [ct.PSDTriangleConeT(n_mat)]
    sol = ct.DefaultSolver(P, q, A, b, cones, settings()).solve()
    assert sol.status == ct.SolverStatus.Solved
    verify_kkt(P, q, A, b, sol)

    # PSD membership of s and z
    def svec_to_mat(x):
        Mx = np.zeros((n_mat, n_mat))
        idx = 0
        for col in range(n_mat):
            for r in range(col + 1):
                v = x[idx] if r == col else x[idx] / np.sqrt(2)
                Mx[r, col] = Mx[col, r] = v
                idx += 1
        return Mx

    assert np.linalg.eigvalsh(svec_to_mat(sol.s)).min() >= -1e-7
    assert np.linalg.eigvalsh(svec_to_mat(sol.z)).min() >= -1e-7


@pytest.mark.parametrize("seed", range(2))
def test_random_expcone_kkt(seed):
    rng = np.random.default_rng(300 + seed)
    n = 3
    P = np.eye(n) * 0.5
    q = rng.normal(size=n)
    # s = b - x in K_exp with a strictly feasible b around the unit point
    A = np.eye(3)
    b = np.array([-1.0, 1.0, 3.0]) + rng.normal(size=3) * 0.05
    cones = [ct.ExponentialConeT()]

    sol = ct.DefaultSolver(P, q, A, b, cones, settings()).solve()
    assert sol.status == ct.SolverStatus.Solved
    verify_kkt(P, q, A, b, sol)
    # primal exp-cone membership: s2 > 0, s3 >= s2 exp(s1/s2)
    s = sol.s
    assert s[1] > -1e-9
    if s[1] > 1e-12:
        assert s[2] >= s[1] * np.exp(s[0] / s[1]) - 1e-6
