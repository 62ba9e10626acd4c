"""AlexNet (torchvision graph), NHWC functional JAX implementation.

Reference source: ``torchvision.models.alexnet`` at
``cnn_models/__init__.py:7``.  Eval-mode forward (dropout = identity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tq_tpu.layers.qctx import QuantCtx
from tq_tpu.models.cnn_common import ConvSpec, conv_init, conv_out, dense_init

# (torch index, in, out, k, stride, pad), maxpool(3, 2) after indices 0, 3, 12.
_CONVS = [
    (0, 3, 64, 11, 4, 2),
    (3, 64, 192, 5, 1, 2),
    (6, 192, 384, 3, 1, 1),
    (8, 384, 256, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]
_POOL_AFTER = {0, 3, 10}
NUM_CLASSES = 1000
_CLASSIFIER = [(1, 256 * 6 * 6, 4096), (4, 4096, 4096), (6, 4096, NUM_CLASSES)]

__all__ = ["init", "apply", "conv_specs", "dense_specs"]


def init(rng):
    params = {}
    for idx, ci, co, k, s, p in _CONVS:
        rng, key = jax.random.split(rng)
        params[f"features.{idx}"] = conv_init(key, k, k, ci, co, bias=True)
    for idx, fi, fo in _CLASSIFIER:
        rng, key = jax.random.split(rng)
        params[f"classifier.{idx}"] = dense_init(key, fi, fo)
    return params


def apply(params, x, ctx: QuantCtx | None = None):
    from tq_tpu.layers.conv import conv2d

    h = x
    for idx, ci, co, k, s, pad in _CONVS:
        name = f"features.{idx}"
        p = params[name]
        if ctx is not None:
            h = ctx.conv(name, p, h, stride=(s, s),
                         padding=[(pad, pad), (pad, pad)])
        else:
            h = conv2d(h, p["w"], (s, s), [(pad, pad), (pad, pad)]) + p["b"]
        h = jax.nn.relu(h)
        if idx in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
    # adaptive avgpool to 6x6 is identity at 224 input (already 6x6).
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
    for idx, fi, fo in _CLASSIFIER:
        name = f"classifier.{idx}"
        p = params[name]
        if ctx is not None:
            h = ctx.dense(name, p, h)
        else:
            h = jnp.dot(h, p["w"]) + p["b"]
        if idx != 6:
            h = jax.nn.relu(h)
    return h


def conv_specs(image: int = 224):
    specs = []
    s = image
    for idx, ci, co, k, st, pad in _CONVS:
        s = conv_out(s, k, st, pad)
        specs.append(ConvSpec(f"features.{idx}", ci, co, k, k, st,
                              out_h=s, out_w=s))
        if idx in _POOL_AFTER:
            s = conv_out(s, 3, 2, 0)
    return specs


def dense_specs():
    return [(f"classifier.{i}", fi, fo) for i, fi, fo in _CLASSIFIER]
