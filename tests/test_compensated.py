"""Double-float (compensated f32) arithmetic: kkt/compensated.py.

The f32 IPM's endgame accuracy rests on error-free transformations
surviving XLA compilation — these tests pin (a) exactness of the
primitives against f64, (b) ~eps² accuracy of the composed matmul /
residual paths, and (c) the end-to-end result: strictly-complementary
SDPs solving to the f32 preset, which plain-f32 arithmetic cannot do
(step errors O(eps·cond(K)) ~ O(1) near convergence).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clarabel_tpu.kkt import compensated as dfc


def _f64(a):
    return np.asarray(a, np.float64)


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=512) * 1e3, jnp.float32)
    b = jnp.asarray(rng.normal(size=512), jnp.float32)
    p, e = jax.jit(dfc._two_prod)(a, b)
    assert np.max(np.abs((_f64(p) + _f64(e)) - _f64(a) * _f64(b))) == 0.0


def test_two_sum_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=512) * 1e4, jnp.float32)
    b = jnp.asarray(rng.normal(size=512), jnp.float32)
    s, e = jax.jit(dfc._two_sum)(a, b)
    assert np.max(np.abs((_f64(s) + _f64(e)) - (_f64(a) + _f64(b)))) == 0.0


def test_df_matmul_eps2():
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(16, 16)) * np.geomspace(1, 1e4, 16),
                    jnp.float32)
    B = jnp.asarray(rng.normal(size=(16, 16)), jnp.float32)
    H, L = jax.jit(dfc.df_matmul)(A, B)
    T = _f64(A) @ _f64(B)
    rel = np.abs((_f64(H) + _f64(L)) - T).max() / np.abs(T).max()
    assert rel < 1e-12  # ~eps^2, far below f32 eps ~ 6e-8


def test_residual_eps2():
    rng = np.random.default_rng(3)
    K = jnp.asarray(rng.normal(size=(64, 64)) * np.geomspace(1, 1e6, 64),
                    jnp.float32)
    x = jnp.asarray(rng.normal(size=64), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=64), jnp.float32)
    r = jax.jit(dfc.residual)(K, x, rhs)
    true = _f64(rhs) - _f64(K) @ _f64(x)
    # output is f32-quantized, so per-element relative eps is the floor;
    # the compensated path must not add accumulation error on top
    err = np.abs(_f64(r) - true)
    tol = 1.5e-7 * (np.abs(true) + np.abs(true).max() * 1e-6)
    assert np.all(err <= tol + 1e-30)


def test_residual_multirhs_and_klo():
    rng = np.random.default_rng(4)
    K = jnp.asarray(rng.normal(size=(32, 32)), jnp.float32)
    K_lo = jnp.asarray(rng.normal(size=(32, 32)) * 1e-8, jnp.float32)
    x = jnp.asarray(rng.normal(size=(32, 2)), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(32, 2)), jnp.float32)
    r = dfc.residual(K, x, rhs, K_lo=K_lo)
    true = _f64(rhs) - (_f64(K) + _f64(K_lo)) @ _f64(x)
    assert np.abs(_f64(r) - true).max() < 5e-7


def test_f32_sdp_batch_oracle():
    """Strictly-complementary SDP batch at the f32 preset (the r4 bench
    failure class): ≥ 7/8 lanes must reach full-tolerance Solved."""
    import clarabel_tpu as ct

    B, n, dmat = 8, 16, 4
    tri = dmat * (dmat + 1) // 2
    rng = np.random.default_rng(2)
    M = rng.normal(size=(B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", M, M) + 0.5 * np.eye(n)
    Apsd = np.zeros((tri, n))
    Apsd[:tri, : min(tri, n)] = -np.eye(tri)[:, : min(tri, n)]
    A = np.tile(np.vstack([np.eye(n), -np.eye(n), Apsd]), (B, 1, 1))
    x_star = 0.5 * rng.normal(size=(B, n))
    m_nn = 2 * n
    s_nn = rng.uniform(0.5, 1.5, (B, m_nn))
    z_nn = np.zeros((B, m_nn))
    act = rng.uniform(size=(B, m_nn)) < 0.25
    z_nn[act] = rng.uniform(0.5, 1.5, act.sum())
    s_nn[act] = 0.0
    G = rng.normal(size=(B, dmat, dmat))
    Qo, _ = np.linalg.qr(G)
    k = dmat // 2
    ls = rng.uniform(0.5, 1.5, (B, k))
    lz = rng.uniform(0.5, 1.5, (B, dmat - k))
    S = np.einsum("bik,bk,bjk->bij", Qo[:, :, :k], ls, Qo[:, :, :k])
    Z = np.einsum("bik,bk,bjk->bij", Qo[:, :, k:], lz, Qo[:, :, k:])

    I, J = np.triu_indices(dmat)
    order = np.lexsort((I, J))
    I, J = I[order], J[order]

    def svec(Mat):
        return Mat[:, I, J] * np.where(I == J, 1.0, np.sqrt(2.0))

    s_star = np.concatenate([s_nn, svec(S)], axis=1)
    z_star = np.concatenate([z_nn, svec(Z)], axis=1)
    b = np.einsum("bmn,bn->bm", A, x_star) + s_star
    q = -(np.einsum("bij,bj->bi", P, x_star)
          + np.einsum("bmn,bm->bn", A, z_star))

    cones = [ct.NonnegativeConeT(2 * n), ct.PSDTriangleConeT(dmat)]
    settings = ct.DefaultSettings.for_float32(verbose=False)
    batch = ct.BatchSolver(P, q, A, b, cones, settings, dtype="float32",
                           device=jax.devices("cpu")[0])
    sol = batch.solve()
    n_ok = sum(1 for s in sol.statuses() if s == ct.SolverStatus.Solved)
    assert n_ok >= 7, [s.name for s in sol.statuses()]
