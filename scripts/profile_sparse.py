"""Per-component TPU profile of the sparse multifrontal iteration.

Times, at the bench.py N=60k banded-QP shape (or --n to change):
  assemble (scatter)   — Kvals from P/A/Hs sources + static reg
  factor               — multifrontal refactorization
  solve 2-RHS raw      — levelized sweeps, no refinement
  solve 2-RHS refined  — solve_kkt_refined through the DIA matvec
  matvec               — one DIA K·v product
  end-to-end           — solver.solve() steady state, ms/iter

Timing discipline per CLAUDE.md: inputs staged through NumPy, outputs
blocked (never downloaded), device compute only.
"""
import argparse
import time

import numpy as np
import scipy.sparse as sp


def bench_fn(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import clarabel_tpu as ct
    from clarabel_tpu.kkt import sparse as kkt_sparse
    from clarabel_tpu import loop as ct_loop

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}")

    rng = np.random.default_rng(0)
    n = args.n
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
    print(f"# setup: {time.perf_counter()-t0:.2f}s")
    ctx = solver._skkt
    data = solver._skkt_data
    N, nnz = ctx.N, ctx.nnz
    print(f"# N={N} nnz={nnz} nnzL={ctx.plan.nnzL} levels={len(ctx.plan.levels)}")
    print(f"# buckets/level: {[len(l) for l in ctx.plan.levels]}")
    print(f"# dia offsets: {len(ctx.dia_offsets)}")

    # host-side canonical Kvals (P/A/Hs=I scatter via the assembly maps)
    npa = ctx.np_arrays
    m = ctx.m
    Kv = np.zeros(nnz, np.float32)
    np.add.at(Kv, npa["kkt:map_P"],
              P_full.tocoo().data[np.asarray(
                  solver._skkt.np_arrays["kkt:P_tril_sel"])].astype(np.float32)
              if False else 0.0)  # P values: use device assemble instead
    # simpler: diagonal-ish synthetic quasidefinite values with the right signs
    Kv = np.zeros(nnz, np.float32)
    Kv[npa["kkt:map_diag"]] = npa["kkt:dsigns"].astype(np.float32) * 2.0
    rng2 = np.random.default_rng(1)
    off = np.setdiff1d(np.arange(nnz), npa["kkt:map_diag"])
    Kv[off] += 0.01 * rng2.standard_normal(off.size).astype(np.float32)
    Kreg = jax.device_put(Kv, dev)

    eps = s.dynamic_regularization_eps
    delta = s.dynamic_regularization_delta

    fac = jax.jit(lambda kv: kkt_sparse.factor(ctx, data, kv, s)[0])
    factors = fac(Kreg)
    t_factor = bench_fn(fac, Kreg, reps=args.reps)
    print(f"factor: {t_factor:.2f} ms")

    rhs1 = jax.device_put(rng.standard_normal(N).astype(np.float32), dev)
    rhs2 = jax.device_put(rng.standard_normal((N, 2)).astype(np.float32), dev)

    raw1 = jax.jit(lambda f, r: kkt_sparse.solve(ctx, data, f, r))
    t_raw1 = bench_fn(raw1, factors, rhs1, reps=args.reps)
    t_raw2 = bench_fn(raw1, factors, rhs2, reps=args.reps)
    print(f"solve raw 1-RHS: {t_raw1:.2f} ms   2-RHS: {t_raw2:.2f} ms")

    def refined2(f, r):
        mv = kkt_sparse.make_matvec(ctx, data, Kreg)
        x, ok = ct_loop.solve_kkt_refined(("mf", (ctx, data, f)), mv, r, s)
        return x
    ref2 = jax.jit(refined2)
    t_ref2 = bench_fn(ref2, factors, rhs2, reps=args.reps)
    t_ref1 = bench_fn(jax.jit(refined2), factors, rhs1, reps=args.reps)
    print(f"solve refined 1-RHS: {t_ref1:.2f} ms   2-RHS: {t_ref2:.2f} ms")

    mvj = jax.jit(lambda kv, v: kkt_sparse.make_matvec(ctx, data, kv)(v))
    t_mv = bench_fn(mvj, Kreg, rhs1, reps=args.reps)
    t_mv2 = bench_fn(mvj, Kreg, rhs2, reps=args.reps)
    print(f"matvec (DIA, incl. layout scatter): 1-RHS {t_mv:.2f} ms  2-RHS {t_mv2:.2f} ms")

    # end to end
    sol = solver.solve()
    t0 = time.perf_counter()
    sol = solver.solve()
    t_solve = (time.perf_counter() - t0) * 1e3
    it = max(int(sol.iterations), 1)
    print(f"end-to-end: {t_solve:.1f} ms, {it} iters, "
          f"{t_solve/(it+1):.1f} ms/iter, status={sol.status.name}")
    per_iter_known = t_factor + t_ref2 + t_ref1
    print(f"known per-iter (factor + refined 2-RHS + refined 1-RHS): "
          f"{per_iter_known:.1f} ms; residual ~{t_solve/(it+1)-per_iter_known:.1f} ms "
          f"(assembly + cone ops + residuals + loop)")


if __name__ == "__main__":
    main()
