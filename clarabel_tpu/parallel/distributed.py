"""Multi-host execution helpers (SURVEY §5.8).

The reference is a single-process library; multi-host scaling is a new
capability of the TPU design.  JAX's runtime owns the communication
fabric — ``jax.distributed.initialize`` wires the hosts together and all
collectives (the psums of the row-sharded Schur path, the convergence
all-reduce of the batched while-loop) ride ICI/DCN through XLA.  These
helpers standardize initialization and mesh construction so the solver
classes work unchanged on a pod slice:

    from clarabel_tpu.parallel import distributed as dist
    dist.initialize()                       # TPU pods: args auto-detected
    mesh = dist.global_mesh(("batch",))     # 1-D over every chip
    mesh2 = dist.global_mesh(("batch", "rows"), shape=(H, C))

``BatchSolver(..., mesh=mesh)`` / ``ShardedRowSolver(..., mesh=mesh)``
then shard over all hosts' devices.  Each host must feed its local shard
of the batch (jax.make_array_from_process_local_data) for host-sharded
input pipelines; the solver classes accept pre-sharded jax arrays as-is.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Initialize multi-host JAX.  On Cloud TPU pods all arguments are
    auto-detected from the environment; elsewhere pass the coordinator's
    ``host:port`` plus process count/id.  Safe to call once per process,
    before any other JAX call."""
    # NB: do not probe jax.process_count() here — it would initialize the
    # XLA backend, after which jax.distributed.initialize() refuses to run
    if jax.distributed.is_initialized():
        return  # already initialized
    init_kwargs = dict(kwargs)
    if coordinator_address is not None:
        init_kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**init_kwargs)


def global_mesh(
    axis_names: Sequence[str] = ("batch",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
    platform: Optional[str] = None,
) -> Mesh:
    """Build a mesh over every addressable device (all hosts).

    ``shape`` reshapes the global device list; default puts everything on
    the first axis.  For a 2-D (batch x rows) mesh on an N-host x C-chip
    slice, ``shape=(N, C)`` keeps the row axis inside each host (psums on
    ICI) and the batch axis across hosts (only the scalar convergence
    reduction crosses DCN).  ``platform`` restricts the device set (e.g.
    ``"cpu"`` for multi-process CPU runs — required in environments where
    a remote accelerator plugin also registers devices)."""
    if devices is None:
        devices = jax.devices(platform)
    devices = np.asarray(devices)
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), tuple(axis_names))
