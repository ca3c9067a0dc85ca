"""Chordal SDP decomposition oracle (reference: tests/sdp_chordal.rs).

The reference's combinatorial oracle: a chordally-decomposable mixed
SDP/power-cone problem solved under every combination of
{compact} x {complete_dual} x {merge_method}, asserting Solved each time.
"""

import numpy as np
import pytest

import clarabel_tpu as ct

SQRT2 = np.sqrt(2.0)


def sdp_chordal_data():
    """reference: tests/sdp_chordal.rs:8-84 (same problem, dense form)."""
    P = np.zeros((8, 8))
    q = np.array([-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])

    A = np.zeros((28, 8))
    cols = {
        0: [(24, -1.0)],
        1: [(7, -SQRT2), (10, -1.0), (22, -1.0)],
        2: [(8, -SQRT2)],
        3: [(12, -SQRT2), (15, -1.0), (25, -1.0)],
        4: [(9, -SQRT2)],
        5: [(13, -SQRT2)],
        6: [(18, -SQRT2), (21, -1.0), (26, -1.0)],
        7: [(0, -1.0), (23, -1.0), (27, -1.0)],
    }
    for c, entries in cols.items():
        for (r, v) in entries:
            A[r, c] = v

    b = np.zeros(28)
    b[1] = 3.0
    b[2] = 2.0 * SQRT2
    b[3] = 2.0
    b[4] = SQRT2
    b[5] = SQRT2
    b[6] = 3.0

    cones = [
        ct.NonnegativeConeT(1),
        ct.PSDTriangleConeT(6),
        ct.PowerConeT(1.0 / 3.0),
        ct.PowerConeT(0.5),
    ]
    return P, q, A, b, cones


@pytest.mark.parametrize("merge_method", ["none", "parent_child", "clique_graph"])
@pytest.mark.parametrize("complete_dual", [False, True])
@pytest.mark.parametrize("compact", [False, True])
def test_sdp_chordal_all_configs(merge_method, complete_dual, compact):
    P, q, A, b, cones = sdp_chordal_data()
    settings = ct.DefaultSettings(
        verbose=False,
        chordal_decomposition_enable=True,
        chordal_decomposition_compact=compact,
        chordal_decomposition_merge_method=merge_method,
        chordal_decomposition_complete_dual=complete_dual,
    )
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved

    # solution must agree with the undecomposed solve
    ref = ct.DefaultSolver(
        P, q, A, b, cones,
        ct.DefaultSettings(verbose=False, chordal_decomposition_enable=False),
    ).solve()
    assert abs(sol.obj_val - ref.obj_val) <= 1e-6
    assert np.linalg.norm(sol.x - ref.x) <= 1e-5

    if complete_dual:
        # completed dual PSD block must be PSD
        def svec_to_mat(x, n):
            M = np.zeros((n, n))
            idx = 0
            for col in range(n):
                for r in range(col + 1):
                    v = x[idx] if r == col else x[idx] / SQRT2
                    M[r, col] = M[col, r] = v
                    idx += 1
            return M

        Z = svec_to_mat(sol.z[1:22], 6)
        assert np.linalg.eigvalsh(Z).min() >= -1e-7


def test_chordal_decomposition_occurs():
    P, q, A, b, cones = sdp_chordal_data()
    settings = ct.DefaultSettings(
        verbose=False, chordal_decomposition_merge_method="none"
    )
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    assert solver._chordal is not None
    assert len(solver._chordal.spatterns) == 1
    # decomposition must add at least one extra clique cone
    assert solver._chordal.spatterns[0].sntree.n_cliques > 1


def test_chordal_banded_sdp():
    # larger banded PSD cone (n=12): band pattern decomposes into a chain
    # of small cliques; solution must match the undecomposed solve
    n_mat = 12
    tri = n_mat * (n_mat + 1) // 2

    def tri_index(i, j):
        return j * (j + 1) // 2 + i

    # banded pattern: diagonal + first off-diagonal
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
            P, q, A, b, cones,
            ct.DefaultSettings(
                verbose=False,
                chordal_decomposition_enable=True,
                chordal_decomposition_compact=compact,
            ),
        )
        assert solver._chordal is not None
        sol = solver.solve()
        assert sol.status == ct.SolverStatus.Solved
        assert abs(sol.obj_val - ref.obj_val) <= 1e-6
        assert np.linalg.norm(sol.x - ref.x) <= 1e-5


def test_decomp_augment_sparse_matches_dense():
    """The chordal transform accepts scipy-sparse (P, A) without
    densifying (the sparse KKT path hands its CSR straight in); both
    transforms must produce exactly the dense path's augmented problem."""
    import scipy.sparse as sp

    from clarabel_tpu.chordal import try_chordal_info
    from clarabel_tpu.cones.api import collapse_cones

    P, q, A, b, cones = sdp_chordal_data()
    cones_int = collapse_cones(tuple(cones))

    for compact in (False, True):
        s = ct.DefaultSettings(
            verbose=False, chordal_decomposition_compact=compact
        )
        info_d = try_chordal_info(A, b, cones_int, s)
        info_s = try_chordal_info(sp.csr_matrix(A), b, cones_int, s)
        assert info_d is not None and info_s is not None
        Pd, qd, Ad, bd, cd = info_d.decomp_augment(P, q, A, b, s)
        Ps, qs, As, bs, cs = info_s.decomp_augment(
            sp.csc_matrix(P), q, sp.csr_matrix(A), b, s
        )
        assert sp.issparse(Ps) and sp.issparse(As)
        np.testing.assert_array_equal(Pd, np.asarray(Ps.todense()))
        np.testing.assert_array_equal(Ad, np.asarray(As.todense()))
        np.testing.assert_array_equal(bd, bs)
        np.testing.assert_array_equal(qd, qs)
        assert cd == cs


@pytest.mark.parametrize("compact", [False, True])
def test_warm_start_through_chordal(compact):
    """Warm starting composes with chordal decomposition (VERDICT r3
    item 8): the user-frame iterate forward-maps through the clique
    transform (decomp.decomp_warm_start) instead of raising."""
    P, q, A, b, cones = sdp_chordal_data()
    settings = ct.DefaultSettings(
        verbose=False,
        chordal_decomposition_enable=True,
        chordal_decomposition_compact=compact,
    )
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    assert solver._chordal is not None
    cold = solver.solve()
    assert cold.status == ct.SolverStatus.Solved

    # re-solve warm from the cold solution: must converge to the same
    # answer in a comparable iteration count (the decomposed frame's
    # overlap structure makes the mapped iterate only approximately
    # feasible, so a small overhead vs cold is acceptable)
    warm = solver.solve(warm_start=cold)
    assert warm.status == ct.SolverStatus.Solved
    assert warm.obj_val == pytest.approx(cold.obj_val, abs=1e-6)
    assert np.linalg.norm(warm.x - cold.x) <= 1e-5
    assert warm.iterations <= cold.iterations + 5

    # MPC-style re-solve after a small objective drift
    q2 = q.copy()
    q2[0] *= 1.02
    solver2 = ct.DefaultSolver(P, q2, A, b, cones, settings)
    warm2 = solver2.solve(warm_start=cold)
    ref2 = solver2.solve()
    assert warm2.status == ct.SolverStatus.Solved
    assert warm2.obj_val == pytest.approx(ref2.obj_val, abs=1e-6)
