"""Multi-process execution of the distributed helpers (SURVEY §5.8,
VERDICT r3 item 5): two coordinator-connected CPU processes build a
global mesh and solve a batch sharded across processes.

This actually executes parallel/distributed.py's init + global_mesh code
paths with jax.process_count() == 2 — the single-process virtual-device
dryruns cannot reach them.
"""

import os
import socket
import subprocess
import sys

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_batch():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        # workers configure their own platform/devices
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_ENABLE_X64")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(rank), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} OK" in out, out
