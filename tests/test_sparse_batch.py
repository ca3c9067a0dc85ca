"""SparseBatchSolver: vmapped multifrontal IPM over shared-structure
batches (MPC/scenario workloads with sparse dynamics)."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax
from jax.sharding import Mesh

import clarabel_tpu as ct


def banded_qp_batch(B, n=60, seed=0):
    """B banded strictly convex QPs with box constraints, one pattern."""
    rng = np.random.default_rng(seed)
    Ps, qs, bs = [], [], []
    for i in range(B):
        main = 2.0 + rng.uniform(0.5, 1.5, n)
        off = rng.uniform(-0.4, 0.4, n - 1)
        P = sp.diags([main, off, off], [0, 1, -1], format="csc")
        Ps.append(P)
        qs.append(rng.standard_normal(n))
        # tight box so a good fraction of the bounds are ACTIVE at the
        # optimum (an inactive-constraint box can mask A-staging bugs)
        bs.append(
            np.concatenate([0.2 * np.ones(n), 0.2 * np.ones(n) + rng.uniform(0, 0.3, n)])
        )
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    cones = [ct.NonnegativeConeT(2 * n)]
    return Ps, np.stack(qs), A, np.stack(bs), cones


def _mf_settings(**kw):
    return ct.DefaultSettings(
        direct_solve_method="multifrontal", verbose=False, **kw
    )


def test_sparse_batch_matches_single():
    B = 3
    Ps, q, A, b, cones = banded_qp_batch(B)
    solver = ct.SparseBatchSolver(Ps, q, A, b, cones, _mf_settings())
    out = solver.solve()
    for i in range(B):
        ref = ct.DefaultSolver(Ps[i], q[i], A, b[i], cones, _mf_settings()).solve()
        assert out.statuses()[i] == ref.status == ct.SolverStatus.Solved
        assert np.allclose(out.x[i], ref.x, atol=1e-7)
        assert abs(out.obj_val[i] - ref.obj_val) <= 1e-7


def test_sparse_batch_socp_lane():
    # mixed cones through the batched sparse path: NN + SOC per lane
    rng = np.random.default_rng(3)
    B, n = 2, 12
    P = sp.eye(n, format="csc")
    A = sp.vstack([sp.eye(n), sp.eye(n)], format="csc")
    q = rng.standard_normal((B, n))
    b = np.concatenate([np.ones(n), np.zeros(n)])
    b = np.tile(b, (B, 1))
    b[:, n] = 2.0  # SOC radius row
    cones = [ct.NonnegativeConeT(n), ct.SecondOrderConeT(n)]
    solver = ct.SparseBatchSolver([P] * B, q, [A] * B, b, cones, _mf_settings())
    out = solver.solve()
    for i in range(B):
        ref = ct.DefaultSolver(P, q[i], A, b[i], cones, _mf_settings()).solve()
        assert out.statuses()[i] == ref.status
        assert np.allclose(out.x[i], ref.x, atol=1e-6)


def test_sparse_batch_update_values_and_warm():
    B = 2
    Ps, q, A, b, cones = banded_qp_batch(B, seed=5)
    solver = ct.SparseBatchSolver(Ps, q, A, b, cones, _mf_settings())
    first = solver.solve()
    assert all(st == ct.SolverStatus.Solved for st in first.statuses())

    # perturb b and q, warm start from the previous batch solution
    q2 = q + 0.01
    b2 = b + 0.05
    solver.update_values(q=q2, b=b2)
    out = solver.solve(warm_start=first)
    for i in range(B):
        ref = ct.DefaultSolver(Ps[i], q2[i], A, b2[i], cones, _mf_settings()).solve()
        assert out.statuses()[i] == ref.status == ct.SolverStatus.Solved
        # warm and cold starts follow different trajectories; both land
        # within the termination tolerance of the same optimum
        assert np.allclose(out.x[i], ref.x, atol=1e-5)

    # P-value update in canonical CSC data order
    P_data = np.stack([np.asarray(P.tocsc().sorted_indices().data) for P in Ps])
    solver.update_values(P_data=1.5 * P_data)
    out2 = solver.solve()
    ref = ct.DefaultSolver(
        sp.csc_matrix(1.5 * Ps[0]), q2[0], A, b2[0], cones, _mf_settings()
    ).solve()
    assert out2.statuses()[0] == ref.status == ct.SolverStatus.Solved
    assert np.allclose(out2.x[0], ref.x, atol=1e-6)


def test_sparse_batch_rejects_pattern_mismatch():
    B = 2
    Ps, q, A, b, cones = banded_qp_batch(B)
    bad = Ps[1].copy().tolil()
    bad[0, 40] = 1e-3
    bad[40, 0] = 1e-3
    with pytest.raises(ValueError, match="sparsity pattern"):
        ct.SparseBatchSolver([Ps[0], bad.tocsc()], q, A, b, cones, _mf_settings())


def test_sparse_batch_over_mesh():
    devices = jax.devices("cpu")
    assert len(devices) >= 8
    mesh = Mesh(np.array(devices[:8]), ("batch",))
    B = 8
    Ps, q, A, b, cones = banded_qp_batch(B, seed=7)
    solver = ct.SparseBatchSolver(Ps, q, A, b, cones, _mf_settings(), mesh=mesh)
    out = solver.solve()
    assert all(st == ct.SolverStatus.Solved for st in out.statuses())
    ref = ct.DefaultSolver(Ps[4], q[4], A, b[4], cones, _mf_settings()).solve()
    assert np.allclose(out.x[4], ref.x, atol=1e-7)


def test_sparse_batch_mixed_statuses():
    """A feasible lane and a primal-infeasible lane in one sparse batch:
    per-lane statuses diverge while the batch runs to collective
    completion (certificates must survive the vmapped while loop)."""
    n = 30
    P = sp.csc_matrix((n, n))
    q = np.ones(n)
    # x_0 <= 1 and -x_0 <= b1 with b1 = -2 -> infeasible (x_0 >= 2, x_0 <= 1)
    A = sp.vstack(
        [sp.eye(n), -sp.eye(n)], format="csc"
    )
    b_feas = np.ones(2 * n)
    b_inf = np.ones(2 * n)
    b_inf[n] = -2.0
    solver = ct.SparseBatchSolver(
        [P, P], np.stack([q, q]), [A, A], np.stack([b_feas, b_inf]),
        [ct.NonnegativeConeT(2 * n)], _mf_settings(),
    )
    out = solver.solve()
    assert out.statuses()[0] == ct.SolverStatus.Solved
    assert out.statuses()[1] == ct.SolverStatus.PrimalInfeasible
