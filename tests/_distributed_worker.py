"""Worker process for test_distributed.py: joins a 2-process CPU
jax.distributed cluster, builds a global mesh, and solves a sharded QP
batch.  Run as:  python _distributed_worker.py <port> <rank> <nproc>
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

port, rank, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import clarabel_tpu as ct  # noqa: E402
from clarabel_tpu.parallel import distributed as dist  # noqa: E402

dist.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=rank)
# NB: the remote-accelerator plugin in this environment ignores
# JAX_PLATFORMS, so everything pins the CPU backend explicitly
assert jax.process_count("cpu") == nproc, jax.process_count("cpu")
assert len(jax.devices("cpu")) == 2 * nproc  # 2 virtual devices/process

mesh = dist.global_mesh(("batch",), platform="cpu")
assert mesh.devices.size == 2 * nproc

B, n = 8, 6
rng = np.random.default_rng(0)  # identical data in every process
M = rng.normal(size=(B, n, n)) / np.sqrt(n)
P = np.einsum("bij,bkj->bik", M, M) + np.eye(n)
q = rng.normal(size=(B, n))
A = np.tile(np.vstack([np.eye(n), -np.eye(n)]), (B, 1, 1))
b = np.ones((B, 2 * n))

batch = ct.BatchSolver(
    P, q, A, b, [ct.NonnegativeConeT(2 * n)],
    ct.DefaultSettings(verbose=False), dtype="float64", mesh=mesh,
)

t0 = time.perf_counter()
out = batch._solve_fn(batch._P, batch._q, batch._A, batch._b)
out["status"].block_until_ready()
t = time.perf_counter() - t0

# each process checks the lanes it actually holds
statuses = np.concatenate(
    [np.asarray(s.data).ravel() for s in out["status"].addressable_shards]
)
objs = np.concatenate(
    [np.asarray(s.data).ravel() for s in out["obj_val"].addressable_shards]
)
assert statuses.size == B // nproc, statuses.size
assert (statuses == int(ct.SolverStatus.Solved)).all(), statuses

# cross-check against a single-process reference on the same lanes
cpu = jax.local_devices(backend="cpu")[0]
ref = ct.BatchSolver(
    P, q, A, b, [ct.NonnegativeConeT(2 * n)],
    ct.DefaultSettings(verbose=False), dtype="float64", device=cpu,
).solve()
lanes = slice(rank * (B // nproc), (rank + 1) * (B // nproc))
np.testing.assert_allclose(objs, ref.obj_val[lanes], atol=1e-8)

print(f"RANK{rank} OK lanes={statuses.size} t_solve={t:.3f}s", flush=True)
