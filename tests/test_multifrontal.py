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
