"""Native C++ symbolic engine vs. the pure-Python fallback."""

import numpy as np
import pytest

from clarabel_tpu import native
from clarabel_tpu.chordal import symbolic as pysym


def random_pattern(n, density, seed):
    rng = np.random.default_rng(seed)
    adj = [set() for _ in range(n)]
    lower = [set() for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < density:
                adj[i].add(j)
                adj[j].add(i)
                lower[i].add(j)
    return adj, lower


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_minimum_degree_is_valid_permutation():
    n = 30
    adj, _ = random_pattern(n, 0.2, 0)
    perm = native.minimum_degree(n, adj)
    assert sorted(perm.tolist()) == list(range(n))


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_symbolic_matches_python():
    for seed in range(5):
        n = 25
        _, lower = random_pattern(n, 0.15, seed)

        native_out = native.symbolic_cholesky(n, lower)
        assert native_out is not None
        L_native, parent_native = native_out

        # pure-python path (bypass native dispatch)
        patterns = [set(c) for c in lower]
        parent = np.full(n, -1, np.int64)
        children = [[] for _ in range(n)]
        for j in range(n):
            pat = patterns[j]
            for c in children[j]:
                pat |= patterns[c] - {j}
            patterns[j] = pat
            if pat:
                p = min(pat)
                parent[j] = p
                children[p].append(j)
        L_py = [sorted(p) for p in patterns]

        assert [list(c) for c in L_native] == L_py
        assert np.array_equal(parent_native, parent)


def test_symbolic_pattern_is_chordal_superset():
    # the factor pattern must contain the original pattern
    n = 20
    _, lower = random_pattern(n, 0.2, 3)
    L_cols, _ = pysym.symbolic_cholesky(n, lower)
    for j in range(n):
        assert set(lower[j]) <= set(L_cols[j])


def test_native_amalgamate_matches_python():
    """cl_amalgamate must make identical merge decisions to the Python
    reference loop: same surviving nodes, cols/rows, parents — hence an
    identical multifrontal schedule."""
    import copy

    import scipy.sparse as sp

    from clarabel_tpu import native
    from clarabel_tpu.kkt import mf_symbolic as mfs

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    for trial, pattern in enumerate(
        [
            sp.diags([np.ones(300), np.ones(299), np.ones(299)], [0, 1, -1]),
            sp.random(200, 200, density=0.03, random_state=1) + sp.eye(200),
        ]
    ):
        K = sp.csc_matrix(sp.tril(pattern))
        n = K.shape[0]
        strict = sp.tril(K, -1).tocsc()
        parent, L_ptr, L_idx = mfs.symbolic_factor_csc(
            n, strict.indptr.astype(np.int64), strict.indices.astype(np.int64)
        )
        nodes_a = mfs._fundamental_supernodes(n, parent, L_ptr, L_idx)
        mfs._split_wide(nodes_a, 1024)
        nodes_b = copy.deepcopy(nodes_a)

        mfs._amalgamate_nodes(nodes_a, 1024, 0.35)  # native
        mfs._amalgamate(nodes_b, 1024, 0.35)        # python reference

        assert [nd.alive for nd in nodes_a] == [nd.alive for nd in nodes_b]
        for a, b in zip(nodes_a, nodes_b):
            if not a.alive:
                continue
            np.testing.assert_array_equal(a.cols, b.cols)
            np.testing.assert_array_equal(a.rows, b.rows)
            assert a.parent == b.parent
            assert sorted(a.children) == sorted(b.children)


def test_flat_schedule_matches_python_pipeline(monkeypatch):
    """analyze() through the native flat supernode pipeline must produce
    the exact schedule of the Python object pipeline (same buckets, index
    maps, workspace layouts)."""
    import scipy.sparse as sp

    from clarabel_tpu import native
    from clarabel_tpu.kkt import mf_symbolic as mfs

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    n = 400
    K = sp.tril(
        sp.diags([np.full(n, 4.0), np.ones(n - 1), np.ones(n - 1),
                  0.5 * np.ones(n - 17)], [0, -1, 1, -17])
    ).tocsc()
    dsigns = np.where(rng.uniform(size=n) < 0.5, 1.0, -1.0)

    plan_native = mfs.analyze(K, dsigns)
    monkeypatch.setattr(native, "_load", lambda: None)
    plan_python = mfs.analyze(K, dsigns)

    assert plan_native.nnzL == plan_python.nnzL
    assert plan_native.W == plan_python.W
    assert plan_native.total_cells == plan_python.total_cells
    assert len(plan_native.levels) == len(plan_python.levels)
    for la, lb in zip(plan_native.levels, plan_python.levels):
        assert [(B.k, B.c_pad, B.u_pad, B.w_off, B.f_off) for B in la] == [
            (B.k, B.c_pad, B.u_pad, B.w_off, B.f_off) for B in lb
        ]
    assert set(plan_native.arrays) == set(plan_python.arrays)
    for key in plan_native.arrays:
        np.testing.assert_array_equal(
            plan_native.arrays[key], plan_python.arrays[key], err_msg=key
        )
