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


def test_f32_schur_diag_ill_scaled_equalities():
    """Ill-scaled + redundant-direction equality blocks on the f32
    diagonal-Schur path: the delta-proxy regularization + refinement must
    either reach the LU-path solution or fail loudly (never a silently
    wrong Solved).  VERDICT r1 weak #3."""
    import numpy as np
    import jax
    import clarabel_tpu as ct

    dev = jax.devices("cpu")[0]
    rng = np.random.default_rng(7)
    n = 12
    M = rng.normal(size=(n, n)) / np.sqrt(n)
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    # equality block with 1e4 scale spread + a nearly dependent row
    G = rng.normal(size=(3, n))
    G[0] *= 1e4
    G[2] = G[1] * (1.0 + 1e-6)  # nearly parallel to row 1
    h = G @ rng.normal(size=n) * 0.1
    A = np.vstack([G, np.eye(n), -np.eye(n)])
    b = np.concatenate([h, np.ones(2 * n)])
    cones = [ct.ZeroConeT(3), ct.NonnegativeConeT(2 * n)]

    s32 = ct.DefaultSettings.for_float32(verbose=False)
    sd = ct.DefaultSolver(P, q, A, b, cones, s32, dtype="float32", device=dev)
    assert sd.info.linear_solver.name == "schur_diag"
    r_sd = sd.solve()

    lu = ct.DefaultSolver(
        P, q, A, b, cones,
        ct.DefaultSettings.for_float32(direct_solve_method="lu", verbose=False),
        dtype="float32", device=dev,
    )
    r_lu = lu.solve()

    ok_states = (ct.SolverStatus.Solved, ct.SolverStatus.AlmostSolved)
    assert r_lu.status in ok_states
    if r_sd.status in ok_states:
        # agreeing solution at f32 tolerances
        assert np.max(np.abs(r_sd.x - r_lu.x)) < 5e-3
        # equality rows actually satisfied (the delta-proxy must not leak
        # into the answer)
        assert np.max(np.abs(G @ r_sd.x - h) / np.maximum(1, np.abs(h))) < 1e-3
    else:
        # a loud failure is acceptable; silence with wrong x is not
        assert r_sd.status in (
            ct.SolverStatus.NumericalError,
            ct.SolverStatus.InsufficientProgress,
        )


def test_f32_expcone_multifrontal_entropy():
    """f32 + nonsymmetric cones through the unpivoted multifrontal LDL:
    the f32-scaled regularization floors in the for_float32 preset must
    carry an entropy-maximization exp-cone problem to Solved (with the
    f64-tuned floors this fails with NumericalError at iteration 1).
    VERDICT r1 item #4 / weak #4."""
    import numpy as np
    import jax
    import clarabel_tpu as ct

    k = 32
    nn = 2 * k
    qv = np.zeros(nn); qv[k:] = -1.0
    Aexp = np.zeros((3 * k, nn)); bexp = np.zeros(3 * k)
    for i in range(k):
        Aexp[3 * i + 0, k + i] = -1.0
        Aexp[3 * i + 1, i] = -1.0
        bexp[3 * i + 2] = 1.0
    Asum = np.zeros((1, nn)); Asum[0, :k] = 1.0
    Apos = np.zeros((k, nn)); Apos[:, :k] = -np.eye(k)
    A = np.vstack([Aexp, Asum, Apos])
    b = np.concatenate([bexp, [1.0], np.zeros(k)])
    cones = [ct.ExponentialConeT()] * k + [
        ct.ZeroConeT(1), ct.NonnegativeConeT(k)
    ]
    s = ct.DefaultSettings.for_float32(
        direct_solve_method="multifrontal", verbose=False
    )
    sol = ct.DefaultSolver(
        np.zeros((nn, nn)), qv, A, b, cones, s,
        dtype="float32", device=jax.devices("cpu")[0],
    ).solve()
    assert sol.status == ct.SolverStatus.Solved
    # max entropy of a 32-point distribution = log(32)
    assert abs(sol.obj_val + np.log(k)) < 1e-3


def test_f32_powcone_multifrontal_sumpow():
    """f32 + 3-D power cones through the unpivoted multifrontal LDL: the
    pow-cone Hessian blocks are more ill-conditioned than exp near the
    boundary (r2 STATUS backlog #5) — the symmetric Jacobi scaling of K
    inside kkt_sparse.factor must carry this to Solved.

    maximize sum_i t_i  s.t. (x_i, 1, t_i) in Pow(0.3), sum x = 1, x >= 0
    -> optimum at uniform x: obj = -k^(1-alpha)."""
    import numpy as np
    import jax
    import clarabel_tpu as ct

    k = 24
    alpha = 0.3
    nn = 2 * k
    qv = np.zeros(nn); qv[k:] = -1.0
    Apow = np.zeros((3 * k, nn)); bpow = np.zeros(3 * k)
    for i in range(k):
        Apow[3 * i + 0, i] = -1.0
        bpow[3 * i + 1] = 1.0
        Apow[3 * i + 2, k + i] = -1.0
    Asum = np.zeros((1, nn)); Asum[0, :k] = 1.0
    Apos = np.zeros((k, nn)); Apos[:, :k] = -np.eye(k)
    A = np.vstack([Apow, Asum, Apos])
    b = np.concatenate([bpow, [1.0], np.zeros(k)])
    cones = [ct.PowerConeT(alpha)] * k + [
        ct.ZeroConeT(1), ct.NonnegativeConeT(k)
    ]
    s = ct.DefaultSettings.for_float32(
        direct_solve_method="multifrontal", verbose=False
    )
    sol = ct.DefaultSolver(
        np.zeros((nn, nn)), qv, A, b, cones, s,
        dtype="float32", device=jax.devices("cpu")[0],
    ).solve()
    assert sol.status == ct.SolverStatus.Solved
    assert abs(sol.obj_val + k ** (1.0 - alpha)) < 1e-2


def test_f32_small_expansion_cones_stay_dense_and_solve():
    """f32 keeps small SOC/genpow cones as dense Hs blocks on the sparse
    path (kkt/sparse.SOC_NO_EXPANSION_MAX_SIZE_F32): the rank-2/3
    expansion's extension rows floor the primal residual near 1e-4 in f32
    and such problems previously landed at AlmostSolved (r2 STATUS "Known
    f32 tier behavior").  With the dense fallback they must reach Solved
    at the for_float32 preset.  f64 keeps the reference threshold of 4
    (socone.rs:46) — covered by test_soc_rank2_expansion_matches_dense."""
    import numpy as np
    import scipy.sparse as sp
    import jax
    import clarabel_tpu as ct

    dev = jax.devices("cpu")[0]
    s = ct.DefaultSettings.for_float32(
        direct_solve_method="multifrontal", verbose=False
    )

    # dim-40 SOC (the documented AlmostSolved case)
    rng = np.random.default_rng(3)
    d = 40
    P = sp.eye(d, format="csc")
    q = rng.standard_normal(d)
    A = sp.vstack([sp.csc_matrix(np.ones((1, d))), -sp.eye(d)], format="csc")
    b = np.concatenate([[1.0], np.zeros(d)])
    cones = [ct.ZeroConeT(1), ct.SecondOrderConeT(d)]
    solver = ct.DefaultSolver(P, q, A, b, cones, s, dtype="float32",
                              device=dev)
    assert solver._skkt.soc_expanded == (False,)  # dense fallback active
    r = solver.solve()
    r64 = ct.DefaultSolver(P, q, A, b, cones,
                           ct.DefaultSettings(verbose=False)).solve()
    assert r.status == ct.SolverStatus.Solved
    assert abs(r.obj_val - r64.obj_val) < 1e-4

    # the basic genpow program (the other documented case)
    P2 = np.zeros((4, 4))
    q2 = np.array([0.0, 0.0, -1.0, 0.0])
    A2 = np.vstack([-np.eye(4),
                    [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 0, 1.0]]])
    b2 = np.array([0, 0, 0, 0, 1.0, 1.0, 0.5])
    cones2 = [ct.GenPowerConeT([0.5, 0.5], 2), ct.ZeroConeT(3)]
    solver2 = ct.DefaultSolver(sp.csc_matrix(P2), q2, sp.csc_matrix(A2), b2,
                               cones2, s, dtype="float32", device=dev)
    assert solver2._skkt.genpow_expanded is False
    r2 = solver2.solve()
    r2_64 = ct.DefaultSolver(P2, q2, A2, b2, cones2,
                             ct.DefaultSettings(verbose=False)).solve()
    assert r2.status == ct.SolverStatus.Solved
    assert abs(r2.obj_val - r2_64.obj_val) < 1e-4

    # a large SOC must still take the rank-2 expansion in f32
    d3 = 300
    P3 = sp.eye(d3, format="csc")
    q3 = rng.standard_normal(d3)
    A3 = sp.vstack([sp.csc_matrix(np.ones((1, d3))), -sp.eye(d3)],
                   format="csc")
    b3 = np.concatenate([[1.0], np.zeros(d3)])
    solver3 = ct.DefaultSolver(P3, q3, A3, b3,
                               [ct.ZeroConeT(1), ct.SecondOrderConeT(d3)],
                               s, dtype="float32", device=dev)
    assert solver3._skkt.soc_expanded == (True,)
