"""TPU re-profile after the matmul extend-add + scan trim + diag kernel.

Measures at N=60k: XLA factor, diag-Pallas factor, assembly-only, and a
hardware consistency check (pivot vector diff XLA vs Pallas).
"""
import time

import numpy as np
import scipy.sparse as sp


def bench_fn(fn, *args, reps=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import clarabel_tpu as ct
    from clarabel_tpu.kkt import sparse as kkt_sparse
    from clarabel_tpu.kkt import multifrontal as mf

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", flush=True)

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
    ctx = solver._skkt
    data = solver._skkt_data

    npa = ctx.np_arrays
    Kv = np.zeros(ctx.nnz, np.float32)
    Kv[npa["kkt:map_diag"]] = npa["kkt:dsigns"].astype(np.float32) * 2.0
    rng2 = np.random.default_rng(1)
    off = np.setdiff1d(np.arange(ctx.nnz), npa["kkt:map_diag"])
    Kv[off] += 0.01 * rng2.standard_normal(off.size).astype(np.float32)
    Kreg = jax.device_put(Kv, dev)

    fac_x = jax.jit(lambda kv: kkt_sparse.factor(ctx, data, kv, s)[0])
    fx = fac_x(Kreg)
    print(f"factor XLA: {bench_fn(fac_x, Kreg):.2f} ms", flush=True)

    fac_d = jax.jit(
        lambda kv: kkt_sparse.factor(ctx, data, kv, s, use_pallas="diag")[0]
    )
    fd = fac_d(Kreg)
    print(f"factor diag-Pallas: {bench_fn(fac_d, Kreg):.2f} ms", flush=True)

    dx = np.asarray(fx["dvec"])
    dd = np.asarray(fd["dvec"])
    rel = np.max(np.abs(dx - dd) / np.maximum(np.abs(dx), 1e-6))
    print(f"pivot diff XLA vs Pallas on hardware: {rel:.3e}", flush=True)

    # assembly-only (stub the math)
    orig = mf.partial_ldl

    def stub(F, c, signs, eps, delta, diag_fn=None):
        import jax.numpy as jnp
        k = F.shape[0]
        return (F[:, :, :c], jnp.abs(F[:, :c, :c].reshape(k, -1)[:, :c]) + 1.0,
                F[:, c:, c:], jnp.asarray(True))

    mf.partial_ldl = stub
    fac_s = jax.jit(lambda kv: kkt_sparse.factor(ctx, data, kv, s)[0])
    fac_s(Kreg)
    print(f"assembly-only: {bench_fn(fac_s, Kreg):.2f} ms", flush=True)
    mf.partial_ldl = orig

    raw = jax.jit(lambda f, r: kkt_sparse.solve(ctx, data, f, r))
    rhs2 = jax.device_put(rng.standard_normal((ctx.N, 2)).astype(np.float32),
                          dev)
    print(f"solve raw 2-RHS: {bench_fn(raw, fx, rhs2):.2f} ms", flush=True)

    # end-to-end through the public API (mode picked by solver: diag)
    sol = solver.solve()
    t0 = time.perf_counter()
    sol = solver.solve()
    t = (time.perf_counter() - t0) * 1e3
    it = max(int(sol.iterations), 1)
    print(f"end-to-end: {t:.1f} ms, {it} iters, {t/(it+1):.1f} ms/iter, "
          f"status={sol.status.name} r_prim={sol.r_prim:.2e}", flush=True)


if __name__ == "__main__":
    main()
