"""Large sparse QP through the multifrontal KKT engine.

A banded box-constrained QP with n + m = 60,000: the problem stays in
scipy-sparse/COO form end-to-end (memory O(nnz(L)), never O((n+m)^2)),
the host runs nested-dissection symbolic analysis once, and every IPM
iteration refactors on device as a short levelized schedule of batched
dense fronts.  On a TPU v5e this solves in ~0.7 s (~90 ms/iteration);
the same problem densified would need a 29 GB KKT matrix.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import scipy.sparse as sp

import clarabel_tpu as ct


def main():
    rng = np.random.default_rng(0)
    n = 20_000
    diags = [2.0 * np.ones(n), -0.5 * np.ones(n - 1), -0.5 * np.ones(n - 1),
             0.1 * np.ones(n - 7)]
    P = sp.diags(diags, [0, 1, -1, 7], format="csc")
    P = ((P + P.T) * 0.5).tocsc()
    q = rng.standard_normal(n)
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    b = np.ones(2 * n)
    cones = [ct.NonnegativeConeT(2 * n)]

    # auto selects the multifrontal engine for large sparse problems;
    # direct_solve_method="multifrontal" forces it
    settings = ct.DefaultSettings.for_float32(verbose=False)

    t0 = time.perf_counter()
    solver = ct.DefaultSolver(P, q, A, b, cones, settings, dtype="float32")
    info = solver.info.linear_solver
    print(f"backend={info.name}  KKT dim={info.dim}  nnz(A)={info.nnzA}  "
          f"nnz(L)={info.nnzL}  "
          f"levels={len(solver._skkt.plan.levels)}  "
          f"setup={time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    sol = solver.solve()  # first call compiles
    print(f"first solve (incl. compile): {time.perf_counter()-t0:.1f}s  "
          f"status={sol.status.name}  iters={sol.iterations}")

    t0 = time.perf_counter()
    sol = solver.solve()
    dt = time.perf_counter() - t0
    print(f"steady-state solve: {dt*1e3:.0f} ms  "
          f"({dt/max(sol.iterations + 1, 1)*1e3:.1f} ms/iteration)  "
          f"obj={sol.obj_val:.4f}  rprim={sol.r_prim:.1e} rdual={sol.r_dual:.1e}")


if __name__ == "__main__":
    main()
