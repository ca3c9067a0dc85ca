"""Double-float LU (kkt/df_ldl.py) and the f32 strict-complementarity
SDP regression (VERDICT r4 #1).

The f32 KKT near convergence reaches cond(K) ~ 1/μ² ~ 1e10; any plain
f32 factorization then has forward error eps·cond ~ O(1) and iterative
refinement cannot contract.  The df LU's application error ~eps² keeps
refinement contracting — these tests pin both the kernel accuracy and
the end-to-end effect on the bench's hardest instance class.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import clarabel_tpu as ct


def _quasidef(n, m, spread, seed=0):
    rng = np.random.default_rng(seed)
    Ablk = rng.normal(size=(m, n))
    Pblk = rng.normal(size=(n, n))
    Pblk = Pblk @ Pblk.T / n + np.eye(n)
    hs = 10.0 ** rng.uniform(-spread, spread, m)
    K = np.zeros((n + m, n + m))
    K[:n, :n] = Pblk
    K[:n, n:] = Ablk.T
    K[n:, :n] = Ablk
    K[n:, n:] = -np.diag(hs)
    return K


def test_df_lu_beats_f32_lu_at_high_cond():
    """Forward error of the double-float LU on a split-scale
    quasidefinite K (cond ~ 2e8): ~eps_df·cond, at least 50x better than
    the plain f32 pivoted LU's eps32·cond."""
    import jax.scipy.linalg as jsl

    from clarabel_tpu.kkt import df_ldl

    K = _quasidef(16, 74, 5.0)
    rng = np.random.default_rng(1)
    rhs = rng.normal(size=K.shape[0])
    exact = np.linalg.solve(K, rhs)

    K32 = jnp.asarray(K, jnp.float32)
    K_lo = jnp.asarray(K - np.asarray(K32, np.float64), jnp.float32)
    r32 = jnp.asarray(rhs, jnp.float32)

    fac, ok = df_ldl.factor(K32, K_lo)
    assert bool(ok)
    x = np.asarray(df_ldl.solve(fac, r32), np.float64)
    err_df = np.linalg.norm(x - exact) / np.linalg.norm(exact)

    lu, piv = jsl.lu_factor(K32)
    xl = np.asarray(jsl.lu_solve((lu, piv), r32), np.float64)
    err_lu = np.linalg.norm(xl - exact) / np.linalg.norm(exact)

    assert err_df < 1e-6, err_df
    assert err_df * 50 < err_lu, (err_df, err_lu)

    # multi-RHS and vmap agree with the single path
    R = jnp.asarray(rng.normal(size=(K.shape[0], 3)), jnp.float32)
    XR = np.asarray(df_ldl.solve(fac, R), np.float64)
    ER = np.linalg.solve(K, np.asarray(R, np.float64))
    assert np.linalg.norm(XR - ER) / np.linalg.norm(ER) < 1e-6

    vf = jax.vmap(lambda kh, kl, r: df_ldl.solve(df_ldl.factor(kh, kl)[0], r))
    xb = np.asarray(
        vf(jnp.stack([K32] * 2), jnp.stack([K_lo] * 2),
           jnp.stack([r32] * 2)),
        np.float64,
    )
    np.testing.assert_allclose(xb[0], x, rtol=0, atol=0)


def _strict_comp_sdp_batch(B, n=16, dmat=4, seed=2):
    """Strictly-complementary SDP instances built from a known
    primal-dual optimal pair (mirrors bench.py:bench_batched_sdp)."""
    tri = dmat * (dmat + 1) // 2

    def svec(Ms):
        rt2 = np.sqrt(2.0)
        out = []
        for col in range(dmat):
            for row in range(col + 1):
                out.append(
                    Ms[:, row, col] * (1.0 if row == col else rt2)
                )
        return np.stack(out, axis=1)

    rng = np.random.default_rng(seed)
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
    s_star = np.concatenate([s_nn, svec(S)], axis=1)
    z_star = np.concatenate([z_nn, svec(Z)], axis=1)
    b = np.einsum("bmn,bn->bm", A, x_star) + s_star
    q = -(np.einsum("bij,bj->bi", P, x_star)
          + np.einsum("bmn,bm->bn", A, z_star))
    return P, q, A, b, n, dmat


def test_f32_sdp_strict_complementarity_batch():
    """The bench's hardest class at the f32 preset: every lane must reach
    Solved (r4 shipped 16/64 failures here; the df LU + f32 PSD
    robustness stack removes them).  A B=8 slice keeps the suite fast;
    the full 64-lane sweep runs in bench.py."""
    P, q, A, b, n, dmat = _strict_comp_sdp_batch(8)
    cones = [ct.NonnegativeConeT(2 * n), ct.PSDTriangleConeT(dmat)]
    settings = ct.DefaultSettings.for_float32(verbose=False)
    cpu = jax.devices("cpu")[0]
    batch = ct.BatchSolver(P, q, A, b, cones, settings, dtype="float32",
                           device=cpu)
    sol = batch.solve()
    assert all(s == ct.SolverStatus.Solved for s in sol.statuses()), (
        [str(s) for s in sol.statuses()]
    )
    # and one straggler-prone instance through the single-problem path
    s1 = ct.DefaultSolver(P[0], q[0], A[0], b[0], cones, settings,
                          dtype="float32", device=cpu)
    r = s1.solve()
    assert r.status == ct.SolverStatus.Solved
    assert s1.info.res_primal < 1e-5 and s1.info.res_dual < 1e-5
