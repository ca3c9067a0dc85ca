"""Amalgamation-aggressiveness experiment at N=60k on the TPU.

Levels cost dispatch chains (factor + both sweeps per solve), so deeper
merging trades MXU-cheap explicit-zero flops for fewer levels.  Compares
the current threshold table against a more aggressive one end-to-end.
"""
import time

import numpy as np
import scipy.sparse as sp


def run(tag):
    import jax
    import clarabel_tpu as ct

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    n = 20000
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
    solver = ct.DefaultSolver(P_full, q, A, b, [ct.NonnegativeConeT(2 * n)],
                              s, dtype="float32", device=dev)
    plan = solver._skkt.plan
    print(f"[{tag}] levels={len(plan.levels)} nnzL={plan.nnzL} "
          f"flops={plan.flops:.2e} "
          f"shapes={[[(B.k, B.c_pad, B.u_pad) for B in l] for l in plan.levels]}",
          flush=True)
    sol = solver.solve()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sol = solver.solve()
        best = min(best, time.perf_counter() - t0)
    it = max(int(sol.iterations), 1)
    print(f"[{tag}] {best*1e3:.1f} ms, {it} iters, {best*1e3/(it+1):.1f} "
          f"ms/iter, status={sol.status.name} r_prim={sol.r_prim:.1e}",
          flush=True)


def main():
    from clarabel_tpu.kkt import mf_symbolic as ms

    run("current")

    orig = ms._merge_threshold

    def aggressive(c_m, relax_frac):
        if c_m <= 64:
            return 1.0
        if c_m <= 256:
            return 0.85
        if c_m <= 512:
            return 0.6
        return relax_frac

    ms._merge_threshold = aggressive
    # force the Python amalgamation (the native C++ loop hard-codes the
    # current table)
    from clarabel_tpu.kkt.mf_symbolic import _amalgamate
    ms._amalgamate_nodes = _amalgamate
    run("aggressive")
    ms._merge_threshold = orig


if __name__ == "__main__":
    main()
