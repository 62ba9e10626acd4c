"""Example: continuous-batching quantized inference over a device mesh.

Demonstrates the serving path: mesh -> TR-converted model -> BatchRunner
packing requests into fixed-size data-sharded batches.  Runs on any
device count (virtual CPU mesh: JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

import jax

# The rig may pre-register a TPU plugin and pin jax_platforms before
# user code runs (sitecustomize), silently overriding JAX_PLATFORMS=cpu;
# honor the env var explicitly (same dance as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tq_tpu.models import mlp
from tq_tpu.parallel.mesh import local_mesh
from tq_tpu.parallel.serving import BatchRunner


def main():
    mesh = local_mesh()
    n = mesh.shape["data"]
    print(f"mesh: {dict(mesh.shape)}")

    params = mlp.init(jax.random.PRNGKey(0))
    settings = mlp.static_layer_settings(4, 16, 14)
    qparams, qcfg, qstate = mlp.convert(params, settings, 6, 6, True)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    fwd = mlp.make_quantized_apply(qcfg, track=False)

    runner = BatchRunner(
        lambda x: fwd(qparams, qstate, x)[0], mesh,
        batch_size=max(32, 4 * n),
    )
    rng = np.random.default_rng(0)
    requests = [rng.normal(size=(1, 28, 28)).astype(np.float32)
                for _ in range(100)]
    results = runner.run_all(requests)
    print(f"served {len(results)} requests; "
          f"first prediction: {int(np.argmax(results[0]))}")


if __name__ == "__main__":
    main()
