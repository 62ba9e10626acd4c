"""Multi-host initialization and per-host data feeding.

SURVEY.md §2.4 communication-backend row: the reference has no
distributed backend at all (single-process DataParallel); the TPU-native
equivalent is ``jax.distributed.initialize`` + a global mesh spanning
all hosts' devices, with each host feeding its local shard of the batch
(``jax.make_array_from_process_local_data``).  Collectives ride ICI
within a slice and DCN across slices — XLA picks, driven by the mesh
axis order.

Single-host (and the CI virtual mesh) is the degenerate case: every
helper below works unchanged with ``jax.process_count() == 1``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "global_mesh", "host_local_batch", "scaling_report"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """``jax.distributed.initialize`` wrapper; no-op when single-host
    (the TPU runtime auto-discovers on real pods)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def global_mesh(n_model: int = 1) -> Mesh:
    """('data','model') mesh over ALL processes' devices.

    'model' stays within a host's devices (contiguous in
    ``jax.devices()``) so TP collectives ride ICI; 'data' spans hosts.
    """
    devices = np.asarray(jax.devices())
    n = len(devices)
    if n % n_model:
        raise ValueError(f"{n} devices not divisible by n_model={n_model}")
    return Mesh(devices.reshape(n // n_model, n_model), ("data", "model"))


def host_local_batch(mesh: Mesh, x_local: np.ndarray):
    """Assemble the global batch-sharded array from this host's shard.

    Each process passes its local slice of the batch; the result is one
    global jax.Array sharded over 'data'.  Single-process, this is just
    a device_put with the batch sharding.
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(x_local, sharding)
    return jax.make_array_from_process_local_data(sharding, x_local)


def scaling_report(step_fn, make_batch, mesh: Mesh, iters: int = 10):
    """Throughput (items/s) of ``step_fn`` on ``mesh``; used to compute
    scaling efficiency across 1-chip / 1-host / N-host runs."""
    import time

    x = host_local_batch(mesh, make_batch())
    jax.block_until_ready(step_fn(x))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step_fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    n_items = x.shape[0]
    return {
        "items_per_s": n_items / dt,
        "n_devices": len(mesh.devices.flat),
        "n_processes": jax.process_count(),
    }
