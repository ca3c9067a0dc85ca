"""Batched sparse solving: an MPC-style workload.

Many conic programs share one sparsity pattern (fixed dynamics structure,
changing values).  ``SparseBatchSolver`` runs ONE multifrontal symbolic
analysis over the pattern and vmaps the numeric factorization and IPM over
the batch — the whole batch solves as a single XLA computation.

Run:  python examples/example_sparse_batch.py
"""

import pathlib
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import clarabel_tpu as ct  # noqa: E402


def make_instances(B, n, seed=0):
    """B tridiagonal QPs with box constraints (one shared pattern)."""
    rng = np.random.default_rng(seed)
    Ps, qs, bs = [], [], []
    for _ in range(B):
        main = 2.0 + rng.uniform(0.5, 1.5, n)
        off = rng.uniform(-0.4, 0.4, n - 1)
        Ps.append(sp.diags([main, off, off], [0, 1, -1], format="csc"))
        qs.append(rng.standard_normal(n))
        bs.append(np.concatenate([np.ones(n), np.ones(n)]))
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    return Ps, np.stack(qs), A, np.stack(bs)


def main():
    B, n = 8, 200
    Ps, q, A, b = make_instances(B, n)
    cones = [ct.NonnegativeConeT(2 * n)]
    # f32 preset: the default 1e-8 tolerances sit below f32 resolution
    # (the accelerator regime); f64 oracle runs use DefaultSettings()
    settings = ct.DefaultSettings.for_float32(
        verbose=False, direct_solve_method="multifrontal"
    )

    solver = ct.SparseBatchSolver(Ps, q, A, b, cones, settings)
    plan = solver.plan
    print(f"shared symbolic plan: nnzL={plan.nnzL} levels={len(plan.levels)}")

    sol = solver.solve()
    print("statuses:", [s.name for s in sol.statuses()])
    print("objectives:", np.round(sol.obj_val, 4))

    # MPC re-solve: shift the data, warm start from the previous solution
    solver.update_values(q=q + 0.05, b=b * 1.01)
    sol2 = solver.solve(warm_start=sol)
    print("re-solve statuses:", [s.name for s in sol2.statuses()])
    print("re-solve iterations:", sol2.iterations)


if __name__ == "__main__":
    main()
