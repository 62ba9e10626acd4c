"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference has no pipeline story (SURVEY.md §2.4 marks PP "absent");
this module adds it the TPU-native way: a ``shard_map`` over a 'stage'
mesh axis where every device holds one pipeline stage's parameters
(leading-axis sharded), activations flow stage-to-stage with
``lax.ppermute`` over ICI, and the whole schedule is one ``lax.scan``
inside a single jitted SPMD program — no host-side scheduling, no
point-to-point runtime.  Composes orthogonally with the 'data' axis
(microbatches stay batch-sharded over 'data' while flowing across
'stage') and differentiates through ``jax.grad`` (ppermute/scan both
have transposes), so the same schedule serves training and inference.

Schedule: the classic GPipe fill-drain pipeline.  With S stages and M
microbatches the scan runs T = M + S - 1 ticks; on tick t stage 0 feeds
microbatch t (while t < M), every stage applies its block to what it
received last tick, and outputs drain from the last stage starting at
tick S - 1.  Bubble fraction is (S - 1) / T, amortized by raising M.

Stages must be shape-homogeneous (same activation width in and out) —
the standard formulation: run the model's stem and head outside the
pipeline (they are cheap and replicated) and pipeline the repeated
trunk blocks.  ``build_mlp_pipeline`` demonstrates this on a deep
MLP trunk; ``make_tr_block_fn`` supplies a term-revealed (quantized)
block so TR serving runs under PP unchanged.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
from tq_tpu.parallel._compat import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "pipeline_apply",
    "make_pipeline_mesh",
    "make_tr_block_fn",
    "build_mlp_pipeline",
]


def make_pipeline_mesh(n_stage: int, n_data: int | None = None,
                       devices=None) -> Mesh:
    """A ('data', 'stage') mesh; the data axis absorbs leftover devices."""
    import numpy as np

    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n_data is None:
        if n % n_stage:
            raise ValueError(f"{n} devices not divisible by n_stage={n_stage}")
        n_data = n // n_stage
    if n_data * n_stage > n:
        raise ValueError(
            f"mesh needs n_data*n_stage = {n_data}*{n_stage} = "
            f"{n_data * n_stage} devices but only {n} are available"
        )
    if n_data * n_stage < n:
        warnings.warn(
            f"pipeline mesh uses {n_data * n_stage} of {n} devices "
            f"({n - n_data * n_stage} idle)",
            stacklevel=2,
        )
    grid = np.asarray(devices[: n_data * n_stage]).reshape(n_data, n_stage)
    return Mesh(grid, ("data", "stage"))


def pipeline_apply(stage_params, x_micro, block_fn, mesh: Mesh,
                   data_axis: str | None = "data",
                   stage_axis: str = "stage"):
    """Run microbatches through the stage pipeline; returns their outputs.

    Args:
      stage_params: pytree whose leaves carry a leading axis of length
        ``n_stage`` (stage s's slice is stage s's parameters); sharded
        over ``stage_axis``.
      x_micro: (n_micro, micro_batch, width) input microbatches;
        batch-sharded over ``data_axis`` when given.
      block_fn: ``block_fn(params_s, x) -> y`` with x/y both
        (micro_batch, width) — one stage's computation.
      mesh: mesh containing ``stage_axis`` (and ``data_axis``).

    Returns:
      (n_micro, micro_batch, width) stage-(S-1) outputs, replicated over
      ``stage_axis`` (psum of the masked drain buffer) and still sharded
      over ``data_axis``.
    """
    n_stage = mesh.shape[stage_axis]
    n_micro = x_micro.shape[0]
    if n_micro < 1:
        raise ValueError("need at least one microbatch")
    ticks = n_micro + n_stage - 1
    fwd = [(i, i + 1) for i in range(n_stage - 1)]

    batch_spec = P(None, data_axis, None) if data_axis else P()
    param_spec = P(stage_axis)

    def run(params, xm):
        # shard_map hands each device its own stage slice with the
        # leading axis intact (length 1): drop it.
        params = jax.tree.map(lambda l: l[0], params)
        sid = jax.lax.axis_index(stage_axis)
        is_first = (sid == 0)
        is_last = (sid == n_stage - 1)
        zero = jnp.zeros(xm.shape[1:], xm.dtype)

        def tick(carry, t):
            prev_out, out_buf = carry
            # What arrived from the previous stage (stage 0 gets zeros).
            recv = jax.lax.ppermute(prev_out, stage_axis, fwd) \
                if n_stage > 1 else prev_out
            feed = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            inp = jnp.where(is_first, feed, recv)
            out = block_fn(params, inp)
            # Drain: last stage finishes microbatch (t - (S-1)) on tick t.
            slot = jnp.clip(t - (n_stage - 1), 0, n_micro - 1)
            drained = jax.lax.dynamic_update_index_in_dim(
                out_buf, out, slot, 0)
            take = is_last & (t >= n_stage - 1)
            out_buf = jnp.where(take, drained, out_buf)
            return (out, out_buf), None

        init = (zero, jnp.zeros_like(xm))
        (_, out_buf), _ = jax.lax.scan(
            tick, init, jnp.arange(ticks, dtype=jnp.int32))
        # Only the last stage holds real outputs; replicate via psum.
        out_buf = jnp.where(is_last, out_buf, jnp.zeros_like(out_buf))
        return jax.lax.psum(out_buf, stage_axis)

    return shard_map(
        run, mesh=mesh,
        in_specs=(param_spec, batch_spec),
        out_specs=batch_spec,
        check_rep=False,
    )(stage_params, x_micro)


def make_tr_block_fn(bits: int, num_keep_terms: int):
    """A term-revealed dense+ReLU pipeline block.

    ``params = {'w': (d, d), 'b': (d,), 'w_sf': scalar, 'a_sf': scalar}``
    with the weight already fake-quantized offline (tr_conv/dense
    convert); activations are per-element term-revealed with the
    calibrated scale before the MXU matmul — the same serving semantics
    as :func:`tq_tpu.layers.linear.tr_dense_apply`, restated in the
    stage-homogeneous form the pipeline needs.
    """
    from tq_tpu.ops.term_reveal import term_reveal_elementwise

    def block(params, x):
        xq = term_reveal_elementwise(x, params["a_sf"], bits, num_keep_terms)
        y = jnp.dot(xq, params["w"], preferred_element_type=jnp.float32)
        return jax.nn.relu(y + params["b"])

    return block


def build_mlp_pipeline(rng, n_stage: int, width: int = 512,
                       in_dim: int = 784, n_classes: int = 10):
    """Deep-MLP pipeline demo: replicated stem/head + staged trunk.

    Returns ``(params, forward)`` where ``forward(params, x_micro, mesh)``
    maps (n_micro, mb, in_dim) images to (n_micro, mb, n_classes)
    log-probabilities, pipelining the trunk over 'stage'.
    """
    ks = jax.random.split(rng, n_stage + 2)
    scale = 1.0 / jnp.sqrt(width)
    params = {
        "stem": {
            "w": jax.random.normal(ks[0], (in_dim, width)) / jnp.sqrt(in_dim),
            "b": jnp.zeros((width,)),
        },
        "trunk": {
            "w": jax.random.normal(ks[1], (n_stage, width, width)) * scale,
            "b": jnp.zeros((n_stage, width)),
        },
        "head": {
            "w": jax.random.normal(ks[2], (width, n_classes)) * scale,
            "b": jnp.zeros((n_classes,)),
        },
    }

    def block(p, x):
        return jax.nn.relu(
            jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"])

    def forward(params, x_micro, mesh: Mesh):
        h = jax.nn.relu(
            jnp.einsum("mbi,io->mbo", x_micro, params["stem"]["w"])
            + params["stem"]["b"])
        h = pipeline_apply(params["trunk"], h, block, mesh)
        logits = (jnp.einsum("mbi,io->mbo", h, params["head"]["w"])
                  + params["head"]["b"])
        return jax.nn.log_softmax(logits, axis=-1)

    return params, forward
