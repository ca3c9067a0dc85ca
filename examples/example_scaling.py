"""Scenario-batch scaling-efficiency harness (BASELINE.md north star:
>= 80% batch scaling efficiency from 1 chip to N chips).

Solves the same problem batch on 1 device and on an N-device mesh and
reports efficiency = T(1) / (T(N) * 1)  (strong scaling: fixed total
batch), plus weak scaling (batch grows with the mesh).

Run on real hardware:  python examples/example_scaling.py
(on a single-chip or CPU-only machine the numbers are produced on
virtual devices, where wall-clock efficiency is NOT meaningful — the
harness says so.)

Multi-process mode (the jax.distributed path, SURVEY §5.8):
    python examples/example_scaling.py --multiprocess
launches 2 coordinator-connected CPU worker processes on this machine
and reports the 2-process solve time — it executes the real
parallel/distributed.py code paths (init, global mesh, cross-process
collectives via Gloo), again with virtual-device wall-clock caveats.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def time_solve(batch, reps=5):
    args = (batch._P, batch._q, batch._A, batch._b)
    batch._solve_fn(*args)["status"].block_until_ready()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        batch._solve_fn(*args)["status"].block_until_ready()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    from jax.sharding import Mesh

    import clarabel_tpu as ct

    devices = jax.devices()
    virtual = len(devices) < 2 or devices[0].platform == "cpu"
    if len(devices) < 2:
        devices = jax.devices("cpu")
    ndev = len(devices)
    print(f"devices: {ndev} x {devices[0].platform}")
    if virtual:
        print("NOTE: virtual/CPU devices share one physical machine — "
              "wall-clock efficiency below is not meaningful; use this "
              "harness on a real multi-chip slice.")

    B, n = 64 * ndev, 32
    rng = np.random.default_rng(0)
    M = rng.normal(size=(B, n, n)) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", M, M) + 0.5 * np.eye(n)
    q = rng.normal(size=(B, n))
    A = np.tile(np.vstack([np.eye(n), -np.eye(n)]), (B, 1, 1))
    b = np.ones((B, 2 * n))
    cones = [ct.NonnegativeConeT(2 * n)]
    settings = ct.DefaultSettings.for_float32(verbose=False)

    # strong scaling: same batch, 1 device vs N devices
    one = ct.BatchSolver(P, q, A, b, cones, settings, dtype="float32",
                         device=devices[0])
    t1 = time_solve(one)

    mesh = Mesh(np.array(devices), ("batch",))
    many = ct.BatchSolver(P, q, A, b, cones, settings, dtype="float32",
                          mesh=mesh)
    tn = time_solve(many)

    eff = t1 / (tn * ndev)
    print(f"strong scaling  B={B}: T(1)={t1*1e3:.1f}ms "
          f"T({ndev})={tn*1e3:.1f}ms  efficiency={eff:.1%}")

    # weak scaling: per-device batch fixed
    Bw = 64
    onew = ct.BatchSolver(P[:Bw], q[:Bw], A[:Bw], b[:Bw], cones, settings,
                          dtype="float32", device=devices[0])
    t1w = time_solve(onew)
    effw = t1w / tn
    print(f"weak scaling    {Bw}/device: T(1,B={Bw})={t1w*1e3:.1f}ms "
          f"T({ndev},B={B})={tn*1e3:.1f}ms  efficiency={effw:.1%}")


def main_multiprocess():
    """2-process CPU run through tests/_distributed_worker.py."""
    import socket

    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    worker = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "_distributed_worker.py",
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(port), str(r), "2"],
                         env=env)
        for r in range(2)
    ]
    rc = [p.wait(timeout=480) for p in procs]
    print(f"2-process run exit codes: {rc} "
          f"({'OK' if rc == [0, 0] else 'FAILED'})")


if __name__ == "__main__":
    if "--multiprocess" in sys.argv:
        main_multiprocess()
    else:
        main()
