"""End-to-end sparse solve timing at N=60k (and optionally N=210k)."""
import argparse
import time

import numpy as np
import scipy.sparse as sp


def run(n, reps=3):
    import jax
    import clarabel_tpu as ct

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    diags = [2.0 * np.ones(n), -0.5 * np.ones(n - 1), -0.5 * np.ones(n - 1),
             0.1 * np.ones(n - 7)]
    Pm = sp.diags(diags, [0, 1, -1, 7], format="csc")
    P_full = ((Pm + Pm.T) * 0.5).tocsc()
    q = rng.standard_normal(n)
    A = sp.vstack([sp.eye(n), -sp.eye(n)], format="csc")
    b = np.concatenate([np.ones(n), np.ones(n)])
    s = ct.DefaultSettings.for_float32(
        direct_solve_method="multifrontal", verbose=False
    )
    t0 = time.perf_counter()
    solver = ct.DefaultSolver(P_full, q, A, b, [ct.NonnegativeConeT(2 * n)],
                              s, dtype="float32", device=dev)
    t_setup = time.perf_counter() - t0
    sol = solver.solve()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sol = solver.solve()
        best = min(best, time.perf_counter() - t0)
    it = max(int(sol.iterations), 1)
    print(f"N={solver._skkt.N}: setup {t_setup:.2f}s, solve {best*1e3:.1f} ms,"
          f" {it} iters, {best*1e3/(it+1):.1f} ms/iter,"
          f" status={sol.status.name} r_prim={sol.r_prim:.2e}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[20000])
    args = ap.parse_args()
    for n in args.n:
        run(n)
