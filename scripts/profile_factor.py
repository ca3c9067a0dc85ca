"""Bisect the multifrontal factor's 21.5 ms at N=60k into components:

  V0  full factor (baseline)
  V1  partial_ldl stubbed out       -> assembly scatters + slices + Linv
  V2  V1 + no L11 inverses          -> pure assembly/slice cost
  V3  full factor, no L11 inverses  -> scan+trisolve+einsum + assembly
  V4  full factor, isfinite checks off

Run on the TPU; every variant is its own jit compile (slow through the
tunnel) — expect ~10 min total.
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
    import jax.numpy as jnp
    import clarabel_tpu as ct
    from clarabel_tpu.kkt import sparse as kkt_sparse
    from clarabel_tpu.kkt import multifrontal as mf

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}")

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

    orig_partial = mf.partial_ldl
    orig_inv = mf._INV_MAX_C

    def run(tag):
        fac = jax.jit(lambda kv: kkt_sparse.factor(ctx, data, kv, s)[0])
        t = bench_fn(fac, Kreg)
        print(f"{tag}: {t:.2f} ms", flush=True)
        return t

    run("V0 full")

    def stub(F, c, signs, eps, delta):
        k, r, _ = F.shape
        return (F[:, :, :c], jnp.abs(F[:, :c, :c].reshape(k, -1)[:, :c]) + 1.0,
                F[:, c:, c:], jnp.asarray(True))

    mf.partial_ldl = stub
    run("V1 no-partial_ldl")
    mf._INV_MAX_C = 0
    run("V2 no-partial_ldl, no-Linv")
    mf.partial_ldl = orig_partial
    run("V3 full, no-Linv")
    mf._INV_MAX_C = orig_inv


if __name__ == "__main__":
    main()
