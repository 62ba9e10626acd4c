"""Worker process for the two-process jax.distributed test.

Usage: python _multihost_worker.py <process_id> <num_processes> <coord_addr>

Each process owns 4 virtual CPU devices; together they form one global
8-device ('data','model') mesh.  The worker runs the REAL multi-host
path of ``tq_tpu.parallel.multihost``: ``initialize`` (the
``jax.distributed.initialize`` wrapper), ``global_mesh``,
``host_local_batch`` (``make_array_from_process_local_data``), and one
psum-carrying quantized step under shard_map.  It prints a JSON line the
parent asserts on: both processes must see 8 global devices, 2
processes, and the identical global psum (whose value depends on BOTH
processes' local shards — proof the collective crossed processes).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

proc_id, num_procs, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from tq_tpu.parallel._compat import shard_map  # noqa: E402
from tq_tpu.parallel.multihost import (  # noqa: E402
    global_mesh,
    host_local_batch,
    initialize,
)
from tq_tpu.ops.term_reveal import term_reveal_elementwise  # noqa: E402

initialize(coord, num_procs, proc_id)
assert jax.process_count() == num_procs, jax.process_count()

mesh = global_mesh(n_model=2)
n_data = mesh.shape["data"]

# Per-process local shard: DIFFERENT data per process, so the global
# reduction's value can only be right if the collective crossed them.
local = np.full((8 // num_procs, 16), float(proc_id + 1), np.float32)
x = host_local_batch(mesh, local)


def step(xs):
    # Quantize the local shard, then a cross-process psum over 'data'.
    xq = term_reveal_elementwise(xs, jnp.float32(0.25), 6, 2)
    return jax.lax.psum(jnp.sum(xq), axis_name="data")


total = shard_map(
    step, mesh=mesh, in_specs=P("data"), out_specs=P(),
    check_rep=False,
)(x)

# batch rows: half are 1.0, half are 2.0; quantized at sf=0.25 they stay
# exact (4 and 8 grid steps), so the global sum is analytic.
expect = float(16 * (4 * 1.0 + 4 * 2.0))
print(json.dumps({
    "process_id": proc_id,
    "process_count": jax.process_count(),
    "global_devices": len(jax.devices()),
    "local_devices": len(jax.local_devices()),
    "psum": float(np.asarray(total)),
    "expect": expect,
}), flush=True)
