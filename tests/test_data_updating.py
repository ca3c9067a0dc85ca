"""Parametric data-updating oracle (reference: tests/data_updating.rs)."""

import numpy as np
import pytest
import scipy.sparse as sp

import clarabel_tpu as ct


def updating_data():
    # huge values so the equilibration scaling is small and must carry
    # through the update correctly
    P = np.array([[40000.0, 1.0], [1.0, 20000.0]])
    q = np.array([10000.0, 10000.0])
    A = np.vstack([-np.eye(2), np.eye(2)])
    b = np.ones(4)
    cones = [ct.NonnegativeConeT(2), ct.NonnegativeConeT(2)]
    settings = ct.DefaultSettings(verbose=False, presolve_enable=False)
    return P, q, A, b, cones, settings


def _solve_fresh(P, q, A, b, cones, settings):
    return ct.DefaultSolver(P, q, A, b, cones, settings).solve()


def test_update_P_matrix_form():
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    solver.solve()

    P2 = P.copy()
    P2[0, 0] = 100.0
    solver.update_P(P2)
    s1 = solver.solve()

    s2 = _solve_fresh(P2, q, A, b, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_P_vector_form():
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(sp.csc_matrix(P), q, A, b, cones, settings)
    solver.solve()

    # triu(P) nzval in CSC order: [P00, P01, P11]
    solver.update_P(np.array([100.0, 1.0, 20000.0]))
    s1 = solver.solve()

    P2 = P.copy()
    P2[0, 0] = 100.0
    s2 = _solve_fresh(P2, q, A, b, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_P_tuple():
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(sp.csc_matrix(P), q, A, b, cones, settings)
    solver.solve()

    # triu nzval indices 1, 2 are P01 and P11
    solver.update_P((np.array([1, 2]), np.array([3.0, 5.0])))
    s1 = solver.solve()

    P2 = np.array([[P[0, 0], 3.0], [3.0, 5.0]])
    s2 = _solve_fresh(P2, q, A, b, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_A_matrix_form():
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)

    A2 = A.copy()
    A2[1, 1] = -1000.0
    solver.update_A(A2)
    s1 = solver.solve()

    s2 = _solve_fresh(P, q, A2, b, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_A_tuple():
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, sp.csc_matrix(A), b, cones, settings)
    solver.solve()

    # CSC nzval order of A (column-major): [(0,0)=-1, (2,0)=1, (1,1)=-1, (3,1)=1]
    solver.update_A((np.array([2]), np.array([-1000.0])))
    s1 = solver.solve()

    A2 = A.copy()
    A2[1, 1] = -1000.0
    s2 = _solve_fresh(P, q, A2, b, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_q_and_b():
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    solver.solve()

    q2 = np.array([500.0, -200.0])
    b2 = np.array([2.0, 1.0, 3.0, 1.0])
    solver.update_q(q2)
    solver.update_b(b2)
    s1 = solver.solve()

    s2 = _solve_fresh(P, q2, A, b2, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_b_tuple():
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    solver.update_b((np.array([0, 2]), np.array([0.5, 2.0])))
    s1 = solver.solve()

    b2 = b.copy()
    b2[0], b2[2] = 0.5, 2.0
    s2 = _solve_fresh(P, q, A, b2, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_combined():
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)

    P2 = P.copy(); P2[0, 0] = 100.0
    b2 = 2.0 * b
    solver.update_data(P=P2, b=b2)
    s1 = solver.solve()

    s2 = _solve_fresh(P2, q, A, b2, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_rejected_after_presolve():
    # reference: data_updating.rs rejection test (:311)
    P, q, A, b, cones, _ = updating_data()
    b = b.copy()
    b[0] = 1e30  # triggers presolve reduction
    settings = ct.DefaultSettings(verbose=False, presolve_enable=True)
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    assert not solver.is_data_update_allowed()
    with pytest.raises(ValueError):
        solver.update_b(b)


def test_update_A_vector_form():
    """Full nzval-vector update of A (reference: data_updating.rs:142-163)."""
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, sp.csc_matrix(A), b, cones, settings)
    solver.solve()

    A_csc = sp.csc_matrix(A)
    new_vals = A_csc.data.copy()
    new_vals[1] = -1000.0  # second nonzero in CSC order
    solver.update_A(new_vals)
    s1 = solver.solve()

    A2 = A_csc.copy()
    A2.data[1] = -1000.0
    s2 = _solve_fresh(P, q, A2.toarray(), b, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_q_tuple():
    """(index, value) update of q (reference: data_updating.rs:213-232)."""
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    solver.solve()

    solver.update_q(([1], [-1000.0]))
    s1 = solver.solve()

    q2 = q.copy()
    q2[1] = -1000.0
    s2 = _solve_fresh(P, q2, A, b, cones, settings)
    assert np.linalg.norm(s1.x - s2.x) <= 1e-7


def test_update_noops():
    """Zero-length tuple updates are accepted no-ops
    (reference: data_updating.rs:280-307)."""
    P, q, A, b, cones, settings = updating_data()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    s0 = solver.solve()

    empty = (np.zeros(0, np.int64), np.zeros(0))
    solver.update_P(empty)
    solver.update_A(empty)
    solver.update_q(empty)
    solver.update_b(empty)
    s1 = solver.solve()
    assert np.linalg.norm(s1.x - s0.x) <= 1e-9


def test_update_allowed_without_reduction():
    """presolve_enable=True but no reducible rows -> updates stay allowed
    (reference: presolver only engages when it reduces)."""
    P, q, A, b, cones, _ = updating_data()
    settings = ct.DefaultSettings(verbose=False)  # presolve enabled
    solver = ct.DefaultSolver(P, q, A, b, cones, settings)
    assert solver.is_data_update_allowed()
    solver.update_q(np.zeros(2))
    assert solver.solve().status == ct.SolverStatus.Solved


def test_update_rejected_after_reduction():
    P, q, A, b, cones, _ = updating_data()
    b2 = b.copy()
    b2[0] = 1e21  # presolve drops this row
    settings = ct.DefaultSettings(verbose=False)
    solver = ct.DefaultSolver(P, q, A, b2, cones, settings)
    assert not solver.is_data_update_allowed()
    import pytest
    with pytest.raises(ValueError):
        solver.update_b(b)
