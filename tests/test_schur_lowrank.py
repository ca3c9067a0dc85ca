"""The Woodbury (diag + rank-1 per SOC) Schur KKT path ("schur_lr").

Validates the exact low-rank factorization of the SOC NT scaling blocks
(reference: socone.rs:227-245 — WᵀW = η²(2wwᵀ - J) = signed diag + rank-1),
the two-level equality-row elimination, and end-to-end solves against the
LU oracle on zero/NN/SOC layouts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import clarabel_tpu as ct
from clarabel_tpu.cones import api, ops as cone_ops
from clarabel_tpu.cones.layout import ConeLayout
from clarabel_tpu.kkt import dense as kkt_dense


def cpu():
    return jax.devices("cpu")[0]


def f32_settings(**kw):
    return ct.DefaultSettings.for_float32(verbose=False, **kw)


def _soc_interior(rng, dims):
    """A strictly interior point of a product of SOCs."""
    v = rng.standard_normal(sum(dims))
    pos = 0
    for d in dims:
        tail = v[pos + 1 : pos + d]
        v[pos] = np.linalg.norm(tail) + 0.5 + rng.random()
        pos += d
    return v


@pytest.mark.parametrize("seed", range(3))
def test_hs_lowrank_matches_dense(seed):
    """diag(h) + U Uᵀ must equal the dense Hs exactly (f64)."""
    rng = np.random.default_rng(seed)
    dims = (3, 5, 2)
    cones = [api.NonnegativeConeT(4)] + [api.SecondOrderConeT(d) for d in dims]
    layout = ConeLayout(api.collapse_cones(cones))

    s = np.concatenate([rng.random(4) + 0.5, _soc_interior(rng, dims)])
    z = np.concatenate([rng.random(4) + 0.5, _soc_interior(rng, dims)])
    state0 = cone_ops.set_identity_scaling(layout, jnp.float64)
    state, ok = cone_ops.update_scaling(
        layout, state0, jnp.asarray(s), jnp.asarray(z),
        jnp.asarray(1.0), jnp.asarray(0, jnp.int32),
    )
    assert bool(ok)

    H = np.asarray(cone_ops.hs_dense(layout, state, jnp.float64)[0])
    h, U = cone_ops.hs_diag_lowrank(layout, state, jnp.float64)
    H_lr = np.diag(np.asarray(h)) + np.asarray(U) @ np.asarray(U).T
    np.testing.assert_allclose(H_lr, H, atol=1e-10 * max(1.0, abs(H).max()))


@pytest.mark.parametrize("seed", range(3))
def test_schur_lr_solve_matches_lu(seed):
    """One refined KKT solve through schur_lr matches the LU backend."""
    rng = np.random.default_rng(100 + seed)
    n, p, n_nn = 7, 2, 5
    dims = (4, 3)
    cones = [
        api.ZeroConeT(p),
        api.NonnegativeConeT(n_nn),
    ] + [api.SecondOrderConeT(d) for d in dims]
    layout = ConeLayout(api.collapse_cones(cones))
    m = layout.m

    M = rng.standard_normal((n, n))
    P = jnp.asarray(M @ M.T + np.eye(n))
    A = jnp.asarray(rng.standard_normal((m, n)))

    s = np.concatenate([np.zeros(p), rng.random(n_nn) + 0.5,
                        _soc_interior(rng, dims)])
    z = np.concatenate([rng.standard_normal(p), rng.random(n_nn) + 0.5,
                        _soc_interior(rng, dims)])
    state0 = cone_ops.set_identity_scaling(layout, jnp.float64)
    state, ok = cone_ops.update_scaling(
        layout, state0, jnp.asarray(s), jnp.asarray(z),
        jnp.asarray(1.0), jnp.asarray(0, jnp.int32),
    )
    assert bool(ok)

    settings = ct.DefaultSettings(verbose=False)
    rhs = jnp.asarray(rng.standard_normal(n + m))

    # LU reference
    Hs, _ = cone_ops.hs_dense(layout, state, jnp.float64)
    K, K_reg = kkt_dense.assemble(P, A, Hs, settings)
    fac_lu, ok_lu = kkt_dense.factor(K_reg)
    x_lu, _ = kkt_dense.solve_refined(fac_lu, K, rhs, settings)

    # schur_lr
    h, U = cone_ops.hs_diag_lowrank(layout, state, jnp.float64)
    fac, matvec, ok_lr = kkt_dense.prepare_schur_lowrank(
        P, A, h, U, settings, n_eq=p
    )
    assert bool(ok_lr)
    x_lr, _ = kkt_dense.solve_refined(fac, matvec, rhs, settings)

    np.testing.assert_allclose(
        np.asarray(x_lr), np.asarray(x_lu), rtol=0, atol=1e-8
    )


def _random_socp(rng, n=8, p=2, n_nn=4, soc=5):
    P = np.eye(n) * 0.5
    q = rng.standard_normal(n)
    A1 = rng.standard_normal((p, n))
    A2 = np.vstack([-np.eye(n)[:n_nn]])
    A3 = rng.standard_normal((soc, n))
    A = np.vstack([A1, A2, A3])
    b = np.concatenate(
        [A1 @ np.ones(n), np.ones(n_nn) * 5, np.zeros(soc)]
    )
    b[p + n_nn] = 10.0
    cones = [
        ct.ZeroConeT(p),
        ct.NonnegativeConeT(n_nn),
        ct.SecondOrderConeT(soc),
    ]
    return P, q, A, b, cones


@pytest.mark.parametrize("seed", range(3))
def test_f32_socp_schur_lr_end_to_end(seed):
    """f32 auto now routes zero/NN/SOC layouts to schur_lr; the solve must
    reach Solved and match the f64 LU oracle objective."""
    rng = np.random.default_rng(200 + seed)
    P, q, A, b, cones = _random_socp(rng)

    oracle = ct.DefaultSolver(
        P, q, A, b, cones, ct.DefaultSettings(verbose=False),
        dtype="float64", device=cpu(),
    ).solve()
    assert oracle.status == ct.SolverStatus.Solved

    solver = ct.DefaultSolver(
        sp.csc_matrix(P), q, sp.csc_matrix(A), b, cones, f32_settings(),
        dtype="float32", device=cpu(),
    )
    sol = solver.solve()
    assert sol.status == ct.SolverStatus.Solved
    assert abs(sol.obj_val - oracle.obj_val) <= 1e-3 * max(
        1.0, abs(oracle.obj_val)
    )


def test_f64_explicit_schur_lr_oracle_accuracy():
    """Explicit schur_lr in f64 reaches the full 1e-8 oracle tier."""
    rng = np.random.default_rng(7)
    P, q, A, b, cones = _random_socp(rng)

    lu = ct.DefaultSolver(
        P, q, A, b, cones, ct.DefaultSettings(verbose=False),
        dtype="float64", device=cpu(),
    ).solve()
    lr = ct.DefaultSolver(
        P, q, A, b, cones,
        ct.DefaultSettings(verbose=False, direct_solve_method="schur_lr"),
        dtype="float64", device=cpu(),
    ).solve()
    assert lu.status == ct.SolverStatus.Solved
    assert lr.status == ct.SolverStatus.Solved
    assert abs(lr.obj_val - lu.obj_val) <= 1e-7
    np.testing.assert_allclose(lr.x, lu.x, atol=1e-6)


def test_schur_lr_demoted_on_unsupported_layouts():
    """An explicit schur_lr request on exp-cone layouts falls back to LU
    (and still solves)."""
    P = np.zeros((3, 3))
    q = np.array([-1.0, 0.0, 0.0])
    A = np.vstack([-np.eye(3), np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])])
    b = np.concatenate([np.zeros(3), [1.0, np.exp(5.0)]])
    cones = [ct.ExponentialConeT(), ct.ZeroConeT(2)]
    sol = ct.DefaultSolver(
        P, q, A, b, cones,
        ct.DefaultSettings(verbose=False, direct_solve_method="schur_lr"),
        dtype="float64", device=cpu(),
    ).solve()
    assert sol.status == ct.SolverStatus.Solved


def test_batched_socp_through_schur_lr():
    """BatchSolver vmaps the schur_lr core over an SOCP batch."""
    rng = np.random.default_rng(3)
    P, q, A, b, cones = _random_socp(rng)
    B = 4
    Ps = np.stack([P] * B)
    As = np.stack([A] * B)
    qs = np.stack([q + 0.01 * i for i in range(B)])
    bs = np.stack([b] * B)

    batch = ct.BatchSolver(
        Ps, qs, As, bs, cones, f32_settings(), dtype="float32",
        device=cpu(),
    )
    out = batch.solve()
    assert all(
        st == ct.SolverStatus.Solved for st in out.statuses()
    ), out.statuses()

    # lane 0 matches a single solve (modulo presolve, disabled here)
    single = ct.DefaultSolver(
        P, qs[0], A, bs[0], cones, f32_settings(presolve_enable=False),
        dtype="float32", device=cpu(),
    ).solve()
    np.testing.assert_allclose(out.x[0], single.x, atol=5e-3)
