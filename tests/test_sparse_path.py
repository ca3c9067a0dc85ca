"""End-to-end tests for the sparse multifrontal KKT path.

The sparse path must reproduce the dense-path oracle exactly (same
statuses, objectives to 1e-8) while never densifying the problem —
reference behavior: qdldl-backed DirectLDLKKTSolver
(src/solver/core/kktsolvers/direct/quasidef/directldlkktsolver.rs with
src/qdldl/qdldl.rs underneath).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import clarabel_tpu as ct


def _settings(**kw):
    kw.setdefault("verbose", False)
    return ct.DefaultSettings(**kw)


def _mf(**kw):
    return _settings(direct_solve_method="multifrontal", **kw)


def _qp_data():
    P = sp.csc_matrix(np.array([[4.0, 1.0], [1.0, 2.0]]))
    q = np.array([1.0, 1.0])
    A = sp.csc_matrix(np.vstack([np.ones((1, 2)), np.eye(2), -np.eye(2)]))
    b = np.array([1.0, 0.7, 0.7, 0.0, 0.0])
    cones = [ct.ZeroConeT(1), ct.NonnegativeConeT(4)]
    return P, q, A, b, cones


def test_qp_oracle_multifrontal():
    P, q, A, b, cones = _qp_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, _mf())
    assert solver._sparse
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert sol.obj_val == pytest.approx(1.88, abs=1e-8)
    np.testing.assert_allclose(sol.x, [0.3, 0.7], atol=1e-7)


@pytest.mark.parametrize("case", ["socp", "exp", "pow", "genpow", "sdp"])
def test_cone_zoo_matches_dense(case):
    if case == "socp":
        P = np.eye(2)
        q = np.array([0.0, -1.0])
        A = np.vstack([-np.eye(2), [[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]]])
        b = np.array([0.0, 0.0, 1.0, 0.0, 0.0])
        cones = [ct.NonnegativeConeT(2), ct.SecondOrderConeT(3)]
    elif case == "exp":
        P = np.zeros((3, 3))
        q = np.array([-1.0, 0.0, 0.0])
        A = np.vstack([-np.eye(3), [[0, 1, 0], [0, 0, 1]]])
        b = np.array([0.0, 0.0, 0.0, 1.0, np.e])
        cones = [ct.ExponentialConeT(), ct.ZeroConeT(2)]
    elif case == "pow":
        P = np.zeros((3, 3))
        q = np.array([0.0, 0.0, -1.0])
        A = np.vstack([-np.eye(3), [[1.0, 0, 0], [0, 1.0, 0]]])
        b = np.array([0, 0, 0, 1.0, 1.0])
        cones = [ct.PowerConeT(0.6), ct.ZeroConeT(2)]
    elif case == "genpow":
        P = np.zeros((4, 4))
        q = np.array([0.0, 0.0, -1.0, 0.0])
        A = np.vstack([-np.eye(4), [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 0, 1.0]]])
        b = np.array([0, 0, 0, 0, 1.0, 1.0, 0.5])
        cones = [ct.GenPowerConeT([0.5, 0.5], 2), ct.ZeroConeT(3)]
    else:  # sdp
        P = np.zeros((3, 3))
        q = np.array([1.0, 0.0, 2.0])
        A = np.vstack([np.array([[1.0, 0.0, 1.0]]), -np.eye(3)])
        b = np.array([1.0, 0, 0, 0])
        cones = [ct.ZeroConeT(1), ct.PSDTriangleConeT(2)]

    P, A = sp.csc_matrix(P), sp.csc_matrix(A)
    r1 = ct.DefaultSolver(P, q, A, b, cones, _mf()).solve()
    r2 = ct.DefaultSolver(P, q, A, b, cones, _settings(direct_solve_method="lu")).solve()
    assert r1.status == r2.status == ct.SolverStatus.Solved
    assert r1.obj_val == pytest.approx(r2.obj_val, abs=1e-7)
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-6)


def test_banded_qp_auto_selects_sparse():
    """A banded sparse QP above the auto gate routes to the multifrontal
    engine and solves to oracle accuracy with a shallow level schedule."""
    rng = np.random.default_rng(1)
    n = 1200
    P = sp.diags(
        [2.0 * np.ones(n), -0.8 * np.ones(n - 1), -0.8 * np.ones(n - 1)],
        [0, 1, -1], format="csc",
    )
    q = rng.standard_normal(n)
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    b = np.ones(2 * n)
    solver = ct.DefaultSolver(P, q, A, b, [ct.NonnegativeConeT(2 * n)], _settings())
    assert solver._sparse  # auto heuristic
    assert len(solver._skkt.plan.levels) <= 32
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    # independent KKT check: P x + q + A' z = 0, |x| <= 1 box
    x, z = sol.x, sol.z
    grad = P @ x + q + A.T @ z
    assert np.max(np.abs(grad)) < 1e-6
    assert np.max(np.abs(x)) <= 1.0 + 1e-7


def test_soc_rank2_expansion_matches_dense():
    """SOC dims > 4 use the rank-2 sparse expansion (socone.rs:46,
    datamaps.rs:112-221): two extension rows per cone instead of a dense
    d x d Hs block, same solution."""
    rng = np.random.default_rng(3)
    d = 40
    P = sp.eye(d, format="csc")
    q = rng.standard_normal(d)
    A = sp.vstack([sp.csc_matrix(np.ones((1, d))), -sp.eye(d)], format="csc")
    b = np.concatenate([[1.0], np.zeros(d)])
    cones = [ct.ZeroConeT(1), ct.SecondOrderConeT(d)]
    solver = ct.DefaultSolver(P, q, A, b, cones, _mf())
    assert solver._skkt.soc_expanded == (True,)
    assert solver._skkt.N == d + 1 + d + 2  # n + m + 2 extension rows
    r1 = solver.solve()
    r2 = ct.DefaultSolver(P, q, A, b, cones,
                          _settings(direct_solve_method="lu")).solve()
    assert r1.status == r2.status == ct.SolverStatus.Solved
    assert r1.obj_val == pytest.approx(r2.obj_val, abs=1e-7)
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-6)


def test_sparse_infeasible_certificates():
    # primal infeasible: x <= -1 and x >= 1 (basic_lp.rs-style)
    P = sp.csc_matrix((1, 1))
    q = np.array([1.0])
    A = sp.csc_matrix(np.array([[1.0], [-1.0]]))
    b = np.array([-1.0, -1.0])
    sol = ct.DefaultSolver(P, q, A, b, [ct.NonnegativeConeT(2)], _mf()).solve()
    assert sol.status == ct.SolverStatus.PrimalInfeasible

    # dual infeasible: min -x s.t. x >= 0 (unbounded above)
    q = np.array([-1.0])
    A = sp.csc_matrix(np.array([[-1.0]]))
    b = np.array([0.0])
    sol = ct.DefaultSolver(
        sp.csc_matrix((1, 1)), q, A, b, [ct.NonnegativeConeT(1)], _mf()
    ).solve()
    assert sol.status == ct.SolverStatus.DualInfeasible


def test_sparse_data_updating():
    P, q, A, b, cones = _qp_data()
    solver = ct.DefaultSolver(
        P, q, A, b, cones, _mf(presolve_enable=False)
    )
    assert solver._sparse and solver.is_data_update_allowed()
    sol0 = solver.solve()

    # q update
    solver.update_q(np.array([0.0, 1.0]))
    sol1 = solver.solve()
    assert sol1.status == ct.SolverStatus.Solved
    ref = ct.DefaultSolver(
        P, np.array([0.0, 1.0]), A, b, cones, _settings()
    ).solve()
    assert sol1.obj_val == pytest.approx(ref.obj_val, abs=1e-7)

    # P nzval update through the retained triu CSC structure
    P2 = np.array([[6.0, 1.0], [1.0, 3.0]])
    solver.update_P(sp.csc_matrix(P2))
    sol2 = solver.solve()
    ref2 = ct.DefaultSolver(sp.csc_matrix(P2), np.array([0.0, 1.0]), A, b,
                            cones, _settings()).solve()
    assert sol2.obj_val == pytest.approx(ref2.obj_val, abs=1e-7)

    # b update
    bnew = b.copy(); bnew[0] = 1.2
    solver.update_b(bnew)
    sol3 = solver.solve()
    assert sol3.status == ct.SolverStatus.Solved

    # A (index, value) update
    solver.update_A(([0], [2.0]))
    sol4 = solver.solve()
    assert sol4.status == ct.SolverStatus.Solved


def test_sparse_warm_start():
    P, q, A, b, cones = _qp_data()
    solver = ct.DefaultSolver(
        P, q, A, b, cones, _mf(presolve_enable=False)
    )
    cold = solver.solve()
    warm = solver.solve(warm_start=cold)
    assert warm.status == ct.SolverStatus.Solved
    assert warm.obj_val == pytest.approx(cold.obj_val, abs=1e-7)
    assert warm.iterations <= cold.iterations


def test_linear_solver_introspection():
    """solver.info names the backend that actually runs
    (reference: kktsolvers/mod.rs:27-38 LinearSolverInfo)."""
    P, q, A, b, cones = _qp_data()
    s_mf = ct.DefaultSolver(P, q, A, b, cones, _mf())
    assert s_mf.info.linear_solver.name == "multifrontal"
    assert s_mf.info.linear_solver.nnzL == s_mf._skkt.plan.nnzL
    assert s_mf.info.linear_solver.dim == s_mf._skkt.N

    s_lu = ct.DefaultSolver(P, q, A, b, cones,
                            _settings(direct_solve_method="lu"))
    assert s_lu.info.linear_solver.name == "lu"
    assert s_lu.info.linear_solver.nnzA == A.nnz
    sol = s_lu.solve()
    assert s_lu.info.linear_solver.name == "lu"  # survives the solve


def test_chordal_sdp_through_sparse_path():
    """Chordal decomposition composes with the multifrontal KKT engine
    (r2 STATUS backlog #3): a banded PSD cone decomposes into a chain of
    small cliques whose sparse coupled KKT solves without densification,
    and the reversal/PSD-completion returns the undecomposed solution."""
    n_mat = 12
    tri = n_mat * (n_mat + 1) // 2

    def tri_index(i, j):
        return j * (j + 1) // 2 + i

    pattern = [(i, i) for i in range(n_mat)]
    pattern += [(i, i + 1) for i in range(n_mat - 1)]
    rows = [tri_index(i, j) for (i, j) in pattern]

    nvar = len(pattern)
    A = np.zeros((tri, nvar))
    for k, r in enumerate(rows):
        A[r, k] = -1.0
    b = np.zeros(tri)
    P = np.eye(nvar)
    q = np.array([-1.0 if i == j else 0.2 for (i, j) in pattern])
    cones = [ct.PSDTriangleConeT(n_mat)]

    ref = ct.DefaultSolver(
        P, q, A, b, cones,
        ct.DefaultSettings(verbose=False, chordal_decomposition_enable=False),
    ).solve()
    assert ref.status == ct.SolverStatus.Solved

    for compact in (False, True):
        solver = ct.DefaultSolver(
            sp.csc_matrix(P), q, sp.csc_matrix(A), b, cones,
            ct.DefaultSettings(
                verbose=False,
                direct_solve_method="multifrontal",
                chordal_decomposition_compact=compact,
            ),
        )
        assert solver._sparse and solver._chordal is not None
        assert solver.info.linear_solver.name == "multifrontal"
        sol = solver.solve()
        assert sol.status == ct.SolverStatus.Solved
        assert abs(sol.obj_val - ref.obj_val) <= 1e-6
        assert np.linalg.norm(sol.x - ref.x) <= 1e-5


def test_auto_cost_model_vetoes_bad_fill():
    """The auto path's cost model (ldlsolvers/auto.rs analog): a problem
    that passes the size/density gate but whose pattern fills badly under
    any ordering falls back to the dense backends; a banded problem of the
    same size stays on the multifrontal engine."""
    rng = np.random.default_rng(2)
    n = 1600

    # random sparse P: ~8 nnz/row with no structure -> catastrophic fill
    Pr = sp.random(n, n, density=0.005, random_state=3, format="csc")
    P = (Pr + Pr.T + 20.0 * sp.eye(n)).tocsc()
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    q = rng.standard_normal(n)
    b = np.ones(2 * n)
    s = _settings()  # auto
    dense_pick = ct.DefaultSolver(P, q, A, b, [ct.NonnegativeConeT(2 * n)], s)
    assert not dense_pick._sparse
    assert dense_pick.info.linear_solver.name != "multifrontal"

    Pb = sp.diags(
        [2.0 * np.ones(n), -0.8 * np.ones(n - 1), -0.8 * np.ones(n - 1)],
        [0, 1, -1], format="csc",
    )
    sparse_pick = ct.DefaultSolver(
        Pb, q, A, b, [ct.NonnegativeConeT(2 * n)], s
    )
    assert sparse_pick._sparse
    assert sparse_pick.info.linear_solver.name == "multifrontal"

    # both still solve correctly
    r1 = dense_pick.solve()
    r2 = sparse_pick.solve()
    assert r1.status == r2.status == ct.SolverStatus.Solved


def test_multifrontal_ill_scaled_equality_rows():
    """Badly scaled zero-cone rows through the multifrontal engine: Ruiz
    equilibration + signed dynamic regularization must carry this to
    Solved with the equalities actually satisfied (the sparse-path analog
    of the dense schur_diag ill-scaling test)."""
    rng = np.random.default_rng(4)
    n = 120
    P = sp.diags(2.0 + rng.uniform(0, 1, n), format="csc")
    q = rng.standard_normal(n)
    # equality block with row scales spanning 1e-4 .. 1e4
    k = 8
    G = rng.standard_normal((k, n))
    scales = np.logspace(-4, 4, k)
    G = G * scales[:, None]
    x_feas = rng.standard_normal(n) * 0.1
    h = G @ x_feas
    A = sp.vstack([sp.csc_matrix(G), sp.eye(n), -sp.eye(n)], format="csc")
    b = np.concatenate([h, np.ones(n), np.ones(n)])
    cones = [ct.ZeroConeT(k), ct.NonnegativeConeT(2 * n)]
    sol = ct.DefaultSolver(P, q, A, b, cones, _mf()).solve()
    assert sol.status == ct.SolverStatus.Solved
    viol = np.abs(G @ sol.x - h) / np.maximum(1.0, np.abs(h))
    assert viol.max() < 1e-7


def test_sparse_path_json_roundtrip(tmp_path):
    """save_to_file on a sparse-path solver writes reference-format JSON
    that reconstructs to the same solution (wire compat, json.rs)."""
    rng = np.random.default_rng(6)
    n = 80
    P = sp.diags([2.0 + rng.uniform(0, 1, n)], [0], format="csc")
    q = rng.standard_normal(n)
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    b = np.ones(2 * n)
    cones = [ct.NonnegativeConeT(2 * n)]
    solver = ct.DefaultSolver(P, q, A, b, cones, _mf())
    ref = solver.solve()
    path = str(tmp_path / "sparse_problem.json")
    solver.save_to_file(path)
    solver2 = ct.DefaultSolver.load_from_file(path)
    out = solver2.solve()
    assert out.status == ref.status == ct.SolverStatus.Solved
    assert abs(out.obj_val - ref.obj_val) < 1e-8


def test_dia_recipe_matvec_matches_segment_matvec():
    """The scatter-free DIA recipe (K lanes assembled from P.kd/A.kd/Hs
    diag; kkt/sparse._build_dia_recipe) must reproduce the segment-sum
    symmetric matvec exactly on a banded zero/NN problem."""
    import jax
    import jax.numpy as jnp

    from clarabel_tpu.kkt import sparse as kkt_sparse
    from clarabel_tpu.cones import ops as cone_ops

    rng = np.random.default_rng(2)
    n = 300
    Pm = sp.diags([2.0 * np.ones(n), -0.5 * np.ones(n - 1),
                   -0.5 * np.ones(n - 1)], [0, 1, -1], format="csc")
    P_full = ((Pm + Pm.T) * 0.5).tocsc()
    q = rng.standard_normal(n)
    Aeq = sp.csc_matrix(
        (np.array([1.0, -1.0, 1.0, -1.0]),
         (np.array([0, 0, 1, 1]), np.array([0, 1, 1, 2]))),
        shape=(2, n),
    )  # x0=x1, x1=x2: banded equality rows
    A = sp.vstack([Aeq, sp.eye(n), -sp.eye(n)], format="csc")
    b = np.concatenate([[0.0, 0.0], np.ones(n), np.ones(n)])
    cones = [ct.ZeroConeT(2), ct.NonnegativeConeT(2 * n)]
    solver = ct.DefaultSolver(P_full, q, A, b, cones, _mf())
    ctx = solver._skkt
    assert ctx.dia_recipe, "recipe must build for banded zero/NN layouts"
    data = solver._skkt_data

    # a consistent (Kvals, hs_vals) pair from real scaling state values
    hs_vals = jnp.asarray(
        rng.uniform(0.5, 2.0, size=2 * n)  # NN nn_w^2 diag
    )
    exp_vals = jnp.zeros(0)
    s = solver.settings
    Kvals, _ = kkt_sparse.assemble(
        ctx, data, solver._P, solver._A, hs_vals, exp_vals, s
    )
    mv_seg = kkt_sparse.make_matvec(ctx, data, Kvals)
    mv_rec = kkt_sparse.make_matvec_sources(
        ctx, solver._P.predia(), solver._A.predia(), hs_vals
    )
    v = jnp.asarray(rng.standard_normal(ctx.N))
    y1 = np.asarray(mv_seg(v))
    y2 = np.asarray(mv_rec(v))
    np.testing.assert_allclose(y1, y2, rtol=1e-12, atol=1e-12)


def test_fused_factor_matches_legacy_assembly():
    """factor_fused (sources scatter straight into the assembly
    workspace, regularization folded in) must produce the same pivots
    and solves as assemble()+factor()."""
    import jax.numpy as jnp

    from clarabel_tpu.kkt import sparse as kkt_sparse

    rng = np.random.default_rng(4)
    n = 400
    Pm = sp.diags([2.0 * np.ones(n), -0.5 * np.ones(n - 1),
                   -0.5 * np.ones(n - 1)], [0, 1, -1], format="csc")
    P_full = ((Pm + Pm.T) * 0.5).tocsc()
    q = rng.standard_normal(n)
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    b = np.ones(2 * n)
    solver = ct.DefaultSolver(P_full, q, A, b,
                              [ct.NonnegativeConeT(2 * n)], _mf())
    ctx = solver._skkt
    assert ctx.dia_recipe
    data = solver._skkt_data
    s = solver.settings
    hs_vals = jnp.asarray(rng.uniform(0.5, 2.0, size=2 * n))
    exp_vals = jnp.zeros(0)

    Kvals, Kreg = kkt_sparse.assemble(
        ctx, data, solver._P, solver._A, hs_vals, exp_vals, s
    )
    f_legacy, ok1 = kkt_sparse.factor(ctx, data, Kreg, s)
    f_fused, ok2 = kkt_sparse.factor_fused(
        ctx, data, solver._P, solver._A, hs_vals, exp_vals, s
    )
    assert bool(ok1) and bool(ok2)
    np.testing.assert_array_equal(
        np.asarray(f_legacy["dvec"]), np.asarray(f_fused["dvec"])
    )
    rhs = jnp.asarray(rng.standard_normal(ctx.N))
    x1 = np.asarray(kkt_sparse.solve(ctx, data, f_legacy, rhs))
    x2 = np.asarray(kkt_sparse.solve(ctx, data, f_fused, rhs))
    np.testing.assert_array_equal(x1, x2)


def test_sparse_json_io_stays_sparse(tmp_path):
    """JSON io on the sparse path must stay O(nnz): save_to_file densifies
    neither P nor A, and load_problem returns scipy-sparse matrices
    (VERDICT r3 missing #5; reference json.rs:22-96 serializes CSC
    natively)."""
    from clarabel_tpu import json_io

    rng = np.random.default_rng(9)
    n = 4000
    P = sp.diags(
        [2.0 + rng.uniform(0, 1, n), -0.3 * np.ones(n - 1),
         -0.3 * np.ones(n - 1)], [0, 1, -1], format="csc",
    )
    q = rng.standard_normal(n)
    # include presolve-redundant rows (b at the infinity bound)
    A = sp.vstack([sp.eye(n), -sp.eye(n), sp.eye(n, format="csr")[:5]], format="csc")
    b = np.concatenate([np.ones(n), np.ones(n), np.full(5, 1e30)])
    cones = [ct.NonnegativeConeT(2 * n + 5)]
    solver = ct.DefaultSolver(P, q, A, b, cones, _mf())
    assert solver._sparse
    ref = solver.solve()

    path = str(tmp_path / "big_sparse.json")
    # densification guard: np.triu on a 4000^2 dense P would be caught by
    # monkeypatching scipy's toarray during save
    import scipy.sparse as _sp

    calls = []
    orig = _sp.csc_matrix.toarray

    def counting_toarray(self, *a, **k):
        calls.append(self.shape)
        return orig(self, *a, **k)

    _sp.csc_matrix.toarray = counting_toarray
    try:
        solver.save_to_file(path)
    finally:
        _sp.csc_matrix.toarray = orig
    assert not calls, f"save_to_file densified: {calls}"

    Pj, qj, Aj, bj, conesj, _ = json_io.load_problem(path)
    assert sp.issparse(Pj) and sp.issparse(Aj)

    solver2 = ct.DefaultSolver.load_from_file(path)
    assert solver2._sparse
    out = solver2.solve()
    assert out.status == ref.status == ct.SolverStatus.Solved
    assert abs(out.obj_val - ref.obj_val) < 1e-6 * max(1.0, abs(ref.obj_val))


def test_cost_model_measured_at_first_use():
    """An unknown device kind measures its own cost-model constants once
    (dispatch-chain + small-LU probes) instead of inheriting the TPU v5e
    table, and the result is cached per device kind (VERDICT r4 #9;
    reference analog: ldlsolvers/auto.rs:47-88 is tuned per platform)."""
    import jax

    from clarabel_tpu import solver as _solver

    d = jax.devices("cpu")[0]
    kind = "test-unknown-device"
    _solver._KKT_COST_MODELS.pop(kind, None)
    try:
        cm = _solver._measure_cost_model(d, kind)
        assert cm["bucket_s"] > 0 and cm["mf_gflops"] > 0
        assert cm["dense_floor_s"] > 0 and cm["dense_n4096_s"] > 0
        assert "measured at first use" in cm["provenance"]

        # _cost_model_for caches the measurement per kind
        class FakeDev:
            device_kind = kind
            platform = "cpu"

        # seed the cache with a sentinel to prove the lookup uses it
        _solver._KKT_COST_MODELS[kind] = dict(cm, provenance="cached")
        got = _solver._cost_model_for(FakeDev())
        assert got["provenance"] == "cached"
        assert got["device_kind"] == kind
    finally:
        _solver._KKT_COST_MODELS.pop(kind, None)
