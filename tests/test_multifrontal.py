"""Direct tests for the multifrontal sparse LDLᵀ engine against SciPy.

Mirrors the factor/solve round-trip coverage of the reference's QDLDL unit
tests (reference: src/qdldl/test.rs), on quasidefinite matrices with the
structures the KKT path produces: random sparse, banded, and 2-D-grid
aggregate patterns.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spl

import jax

from clarabel_tpu.kkt import mf_symbolic, multifrontal

EPS_DYN = 1e-13
DELTA_DYN = 2e-7


def make_quasidef(n, m, density, rng, kind="random"):
    """K = [[P + I, Aᵀ], [A, -H]] with H ≻ 0 diagonal-dominant blocks."""
    if kind == "banded":
        # strictly diagonally dominant bands keep P ≻ 0 (quasidefinite K)
        diags = [rng.uniform(0.2, 1.0, size=n) for _ in range(3)]
        P = sp.diags(diags, [0, 1, 2], shape=(n, n))
        P = (P + P.T + 6.0 * sp.eye(n)).tocsc()
        A = sp.diags([rng.normal(size=n), rng.normal(size=n - 1)], [0, -1],
                     shape=(m, n)).tocsc()
    elif kind == "grid":
        side = int(np.sqrt(n))
        n = side * side
        G = sp.eye(side)
        T = sp.diags([np.ones(side - 1), np.ones(side - 1)], [1, -1])
        P = (sp.kron(G, T) + sp.kron(T, G) + 5.0 * sp.eye(n)).tocsc()
        A = sp.random(m, n, density=density, random_state=rng.integers(1 << 30))
    else:
        M = sp.random(n, n, density=density, random_state=rng.integers(1 << 30))
        P = (M + M.T).tocsc()
        # strict diagonal dominance keeps P ≻ 0 so K is quasidefinite
        dom = np.abs(P).sum(axis=1).max() + 1.0
        P = (P + float(dom) * sp.eye(n)).tocsc()
        A = sp.random(m, n, density=density, random_state=rng.integers(1 << 30))
    A = A.tocsc()
    H = sp.diags(1.0 + rng.random(m))
    K = sp.bmat([[P, A.T], [A, -H]], format="csc")
    K.sort_indices()
    return K


def _factor_solve(K, rhs, n, ordering="auto"):
    N = K.shape[0]
    K_low = sp.tril(K, format="csc")
    K_low.sort_indices()
    dsigns = np.concatenate([np.ones(n), -np.ones(N - n)])
    plan = mf_symbolic.analyze(K_low, dsigns, ordering=ordering)
    arrays = jax.tree.map(jax.device_put, plan.device_arrays())
    Kvals = jax.device_put(np.asarray(K_low.data, np.float64))
    factors, ok = multifrontal.mf_factor(plan, arrays, Kvals, EPS_DYN, DELTA_DYN)
    x = multifrontal.mf_solve(plan, arrays, factors, jax.device_put(rhs))
    return np.asarray(x), bool(ok), plan


@pytest.mark.parametrize("kind,n,m,density", [
    ("random", 60, 40, 0.06),
    ("random", 300, 200, 0.02),
    ("banded", 400, 400, 0.0),
    ("grid", 225, 120, 0.01),
])
def test_factor_solve_matches_scipy(kind, n, m, density):
    rng = np.random.default_rng((len(kind) * 1009 + n) % (1 << 31))
    K = make_quasidef(n, m, density, rng, kind)
    n_var = K.shape[0] - m
    rhs = rng.normal(size=K.shape[0])
    x, ok, plan = _factor_solve(K, rhs, n_var)
    assert ok
    x_ref = spl.spsolve(K.tocsc(), rhs)
    assert np.allclose(x, x_ref, rtol=1e-9, atol=1e-9), (
        np.max(np.abs(x - x_ref))
    )


def test_orderings_agree():
    rng = np.random.default_rng(7)
    K = make_quasidef(120, 80, 0.05, rng)
    rhs = rng.normal(size=K.shape[0])
    x_ref = spl.spsolve(K.tocsc(), rhs)
    for ordering in ("auto", "natural"):
        x, ok, _ = _factor_solve(K, rhs, 120, ordering)
        assert ok
        assert np.allclose(x, x_ref, rtol=1e-9, atol=1e-9)


def test_dynamic_regularization_rescues_zero_pivot():
    # a zero diagonal block in the (1,1) position would break an
    # unregularized LDL; dynamic regularization must keep it finite
    n = 5
    A = sp.eye(n).tocsc()
    P = sp.csc_matrix((n, n))
    H = sp.diags(np.ones(n))
    K = sp.bmat([[P, A.T], [A, -H]], format="csc")
    rhs = np.arange(1.0, 2 * n + 1.0)
    x, ok, _ = _factor_solve(K, rhs, n)
    assert ok
    x_ref = spl.spsolve(K.tocsc(), rhs)
    assert np.allclose(x, x_ref, rtol=1e-6, atol=1e-6)


def test_fill_stats_are_sparse():
    # 2-D grid QP with box rows: the canonical "large sparse" structure;
    # factor storage must scale like nnz(L), far below dense N²
    side = 30
    n = side * side
    G = sp.eye(side)
    T = sp.diags([np.ones(side - 1), np.ones(side - 1)], [1, -1])
    P = (sp.kron(G, T) + sp.kron(T, G) + 5.0 * sp.eye(n)).tocsc()
    A = sp.vstack([sp.eye(n), -sp.eye(n)]).tocsc()
    H = sp.eye(2 * n)
    K = sp.bmat([[P, A.T], [A, -H]], format="csc")
    K_low = sp.tril(K, format="csc")
    N = K.shape[0]
    dsigns = np.concatenate([np.ones(n), -np.ones(N - n)])
    plan = mf_symbolic.analyze(K_low, dsigns)
    assert plan.nnzL < 0.05 * N * N
    assert plan.n_supernodes > 1


def test_pallas_front_kernel_matches_xla_path():
    """The experimental fused Pallas front-factorization kernel
    (CT_PALLAS_FRONT=1 opt-in) must match the XLA blocked partial LDL to
    f32 roundoff; runs in interpreter mode so it validates on CPU."""
    import jax.numpy as jnp

    from clarabel_tpu.kkt import multifrontal as mf
    from clarabel_tpu.kkt import pallas_front as pf

    rng = np.random.default_rng(7)
    for (k, c, r) in [(3, 32, 32), (2, 64, 96), (2, 128, 160)]:
        M = rng.standard_normal((k, r, r)).astype(np.float32)
        M = M + np.transpose(M, (0, 2, 1))
        M[:, np.arange(r), np.arange(r)] += 3.0 * r
        sg = np.ones((k, c), np.float32)
        sg[:, c // 2:] = -1.0
        M[:, np.arange(c // 2, r), np.arange(c // 2, r)] *= -1.0
        F = jnp.asarray(M)
        signs = jnp.asarray(sg)
        Lc, d, U, ok = mf.partial_ldl(F, c, signs, 1e-9, 1e-5)
        Fo, d2 = pf.front_partial_ldl(F, signs, c, 1e-9, 1e-5, interpret=True)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(Lc), np.asarray(Fo[:, :, :c]),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d2),
                                   rtol=2e-5, atol=1e-3)
        if r > c:
            tl = np.tril_indices(r - c)
            got = np.asarray(Fo[:, c:, c:])[:, tl[0], tl[1]]
            want = np.asarray(U)[:, tl[0], tl[1]]
            np.testing.assert_allclose(got, want, atol=5e-4)


def test_pallas_diag_kernel_matches_xla_scan():
    """The default-on (TPU f32) Pallas pivot-chain kernel
    (kkt/pallas_diag.py) runs the exact arithmetic of the XLA
    _diag_factor scan — masked column extraction, expected-sign dynamic
    regularization, rank-1 VPU update — so interpret mode must match
    BIT-EXACTLY, including regularized pivots and padded lanes."""
    import jax.numpy as jnp

    from clarabel_tpu.kkt import multifrontal as mf
    from clarabel_tpu.kkt import pallas_diag as pd

    rng = np.random.default_rng(11)
    for (k, b) in [(3, 8), (5, 32), (200, 32), (2, 64)]:
        M = rng.standard_normal((k, b, b)).astype(np.float32)
        M = M + np.transpose(M, (0, 2, 1))
        M[:, np.arange(b), np.arange(b)] += 2.0 * b
        sg = np.ones((k, b), np.float32)
        sg[:, b // 2:] = -1.0
        M[:, np.arange(b // 2, b), np.arange(b // 2, b)] *= -1.0
        # force a regularization event: zero one pivot
        M[0, b - 1, b - 1] = 0.0
        D = jnp.asarray(M)
        signs = jnp.asarray(sg)
        L1, d1 = mf._diag_factor(D, signs, 1e-9, 1e-5)
        L2, d2 = pd.diag_ldl(D, signs, 1e-9, 1e-5, interpret=True)
        np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
