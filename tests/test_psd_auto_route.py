"""PSD layouts auto-route to the sparse multifrontal KKT engine.

VERDICT r3 item 4: the auto backend must cover every layout the way the
reference's does (ldlsolvers/auto.rs:47-88; PSD Hs blocks assemble
sparsely via kkt_assembly.rs:53-103) — a large banded SDP must not
silently densify just because it contains a PSD cone.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import clarabel_tpu as ct


def _tri_index(i, j):
    return j * (j + 1) // 2 + i


def banded_sdp(n_mat):
    """min  qᵀx + ½xᵀx  s.t.  svec(X) = A·(-x) offsets in a banded PSD
    pattern: diagonal + first off-diagonal (the chordal chain)."""
    tri = n_mat * (n_mat + 1) // 2
    pattern = [(i, i) for i in range(n_mat)]
    pattern += [(i, i + 1) for i in range(n_mat - 1)]
    rows = np.array([_tri_index(i, j) for (i, j) in pattern])
    nvar = len(pattern)
    A = sp.csc_matrix(
        (-np.ones(nvar), (rows, np.arange(nvar))), shape=(tri, nvar)
    )
    b = np.zeros(tri)
    P = sp.eye(nvar, format="csc")
    q = np.array([-1.0 if i == j else 0.2 for (i, j) in pattern])
    return P, q, A, b, [ct.PSDTriangleConeT(n_mat)]


def test_large_banded_sdp_auto_routes_multifrontal():
    """n+m >= 20k banded SDP: auto must pick the sparse engine (the dense
    path could not even materialize A), decompose chordally, and solve to
    oracle accuracy (KKT stationarity + duality gap)."""
    n_mat = 250  # tri = 31375 -> n + m ~ 31.9k
    P, q, A, b, cones = banded_sdp(n_mat)
    solver = ct.DefaultSolver(
        P, q, A, b, cones, ct.DefaultSettings(verbose=False)
    )
    assert solver._sparse, "auto should route the banded SDP sparse"
    assert solver._chordal is not None
    assert solver.info.linear_solver.name == "multifrontal"
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    # KKT stationarity in the user frame
    grad = P @ sol.x + q + A.T @ sol.z
    assert np.max(np.abs(grad)) < 1e-6
    gap = abs(sol.obj_val - sol.obj_val_dual)
    assert gap <= 1e-6 * max(1.0, abs(sol.obj_val))


def test_medium_banded_sdp_matches_dense_path():
    """Same structure at a size the dense path can still check: the
    auto-routed sparse solve must reproduce the dense chordal solve."""
    n_mat = 140  # tri = 9870 -> n + m ~ 10.1k, above the auto gate
    P, q, A, b, cones = banded_sdp(n_mat)
    solver = ct.DefaultSolver(
        P, q, A, b, cones, ct.DefaultSettings(verbose=False)
    )
    assert solver._sparse
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved

    ref = ct.DefaultSolver(
        P.toarray(), q, A.toarray(), b, cones,
        ct.DefaultSettings(verbose=False, direct_solve_method="lu"),
    ).solve()
    assert ref.status == ct.SolverStatus.Solved
    assert sol.obj_val == pytest.approx(ref.obj_val, abs=1e-6)
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-5)


def test_dense_psd_block_still_prefers_dense():
    """A small dense SDP (non-decomposable PSD block) must keep the dense
    backends: the Hs tri-block estimate fails the density gate and no
    chordal decomposition applies."""
    rng = np.random.default_rng(0)
    d = 90
    tri = d * (d + 1) // 2  # 4095 rows, n+m ~ 4.2k but fully dense block
    n = 50
    M = rng.normal(size=(n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.normal(size=n)
    A = np.zeros((tri, n))
    A[:n, :n] = -np.eye(n)
    b = np.zeros(tri)
    k = 0
    for col in range(d):
        for row in range(col + 1):
            if row == col:
                b[k] = 1.0
            k += 1
    solver = ct.DefaultSolver(
        P, q, A, b, [ct.PSDTriangleConeT(d)],
        ct.DefaultSettings(verbose=False),
    )
    assert not solver._sparse
    assert solver.info.linear_solver.name != "multifrontal"


def test_cost_model_provenance_recorded():
    """VERDICT r3 weak 3: the auto cost model's constants must be visible
    with their provenance in solver.info.linear_solver."""
    rng = np.random.default_rng(1)
    n = 1200
    P = sp.diags(
        [2.0 * np.ones(n), -0.8 * np.ones(n - 1), -0.8 * np.ones(n - 1)],
        [0, 1, -1], format="csc",
    )
    q = rng.standard_normal(n)
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    b = np.ones(2 * n)
    solver = ct.DefaultSolver(
        P, q, A, b, [ct.NonnegativeConeT(2 * n)],
        ct.DefaultSettings(verbose=False),
    )
    assert solver._sparse
    cm = solver.info.linear_solver.cost_model
    assert cm is not None
    assert "provenance" in cm and cm["provenance"]
    assert cm["decision"].startswith("multifrontal")
    assert "t_mf_s" in cm and "t_dense_s" in cm
    assert "device_kind" in cm
