"""Example: pipeline-parallel quantized inference over a 'stage' mesh axis.

Demonstrates the GPipe-style microbatched pipeline (`tq_tpu.parallel.pp`):
a deep trunk's blocks are sharded one-per-stage, term-revealed (quantized)
activations hop stage-to-stage over ICI via ppermute, and microbatches
keep the bubble fraction at (S-1)/(M+S-1).  Runs on any device count
(virtual CPU mesh: JAX_PLATFORMS=cpu
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

from tq_tpu.parallel.pp import (
    make_pipeline_mesh,
    make_tr_block_fn,
    pipeline_apply,
)


def main():
    n = len(jax.devices())
    n_stage = max(s for s in (8, 4, 2, 1) if n % s == 0 and s <= n)
    mesh = make_pipeline_mesh(n_stage=n_stage)
    print(f"mesh: {dict(mesh.shape)}  "
          f"(bubble fraction {(n_stage - 1) / (8 + n_stage - 1):.0%} at 8 microbatches)")

    width, n_micro = 512, 8
    # micro_batch must divide evenly over the mesh's 'data' axis (e.g.
    # 6 devices -> n_stage=2, n_data=3): round 32 up to a multiple.
    n_data = mesh.shape["data"]
    micro_batch = ((32 + n_data - 1) // n_data) * n_data
    rng = np.random.default_rng(0)
    # One TR-quantized dense+ReLU block per stage (weights fake-quantized
    # offline; activations term-revealed on the fly at wb=db=7, dt=3).
    stage_params = {
        "w": jnp.asarray(rng.normal(size=(n_stage, width, width)) * 0.05,
                         jnp.float32),
        "b": jnp.zeros((n_stage, width), jnp.float32),
        "w_sf": jnp.full((n_stage,), 0.01, jnp.float32),
        "a_sf": jnp.full((n_stage,), 0.05, jnp.float32),
    }
    block = make_tr_block_fn(bits=7, num_keep_terms=3)

    x = jnp.asarray(rng.normal(size=(n_micro, micro_batch, width)),
                    jnp.float32)
    run = jax.jit(lambda p, x: pipeline_apply(p, x, block, mesh))
    y = jax.block_until_ready(run(stage_params, x))
    print(f"pipelined {n_micro} microbatches of {micro_batch}: "
          f"out {y.shape}, mean |y| = {float(jnp.abs(y).mean()):.4f}")


if __name__ == "__main__":
    main()
