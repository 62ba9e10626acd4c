"""VGG-16-bn (torchvision graph), NHWC functional JAX implementation.

Reference source: ``torchvision.models.vgg16_bn`` imported at
``cnn_models/__init__.py:6-10``.  Param names mirror the torch module
tree (``features.N`` / ``classifier.N``) for mechanical checkpoint
import; conv ordering matches the reference's ``named_modules`` walk so
per-layer setting tables line up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tq_tpu.layers.qctx import QuantCtx
from tq_tpu.models.cnn_common import (
    ConvSpec,
    batch_norm,
    bn_init,
    conv_init,
    dense_init,
)

# Config "D" with batch norm: channels per conv, 'M' = 2x2 maxpool.
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
        512, 512, 512, "M", 512, 512, 512, "M"]
NUM_CLASSES = 1000
_CLASSIFIER = [(512 * 7 * 7, 4096), (4096, 4096), (4096, NUM_CLASSES)]

__all__ = ["init", "apply", "conv_specs", "dense_specs"]


def _feature_layers():
    """Yield ('conv', torch_index, in_ch, out_ch) / ('pool', idx) in order.

    torchvision's Sequential indexing: conv, bn, relu are separate
    entries; maxpool one entry.
    """
    idx = 0
    in_ch = 3
    for v in _CFG:
        if v == "M":
            yield ("pool", idx, None, None)
            idx += 1
        else:
            yield ("conv", idx, in_ch, v)
            idx += 3  # conv, bn, relu
            in_ch = v


def init(rng):
    params = {}
    for kind, idx, in_ch, out_ch in _feature_layers():
        if kind != "conv":
            continue
        rng, k = jax.random.split(rng)
        params[f"features.{idx}"] = conv_init(k, 3, 3, in_ch, out_ch, bias=True)
        params[f"features.{idx + 1}"] = bn_init(out_ch)
    for i, (fi, fo) in zip((0, 3, 6), _CLASSIFIER):
        rng, k = jax.random.split(rng)
        params[f"classifier.{i}"] = dense_init(k, fi, fo)
    return params


def apply(params, x, ctx: QuantCtx | None = None):
    """NHWC forward -> (N, 1000) logits (eval mode: dropout = identity)."""
    from tq_tpu.layers.conv import conv2d

    def cv(name, p, h):
        if ctx is not None:
            return ctx.conv(name, p, h, stride=(1, 1), padding=[(1, 1), (1, 1)])
        y = conv2d(h, p["w"], (1, 1), [(1, 1), (1, 1)])
        return y + p["b"]

    h = x
    for kind, idx, in_ch, out_ch in _feature_layers():
        if kind == "pool":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )
        else:
            h = cv(f"features.{idx}", params[f"features.{idx}"], h)
            h = jax.nn.relu(batch_norm(params[f"features.{idx + 1}"], h))
    # torch flattens NCHW (C fastest-varying last = C*H*W order); match it
    # so imported classifier weights see the same feature order.
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
    for i in (0, 3, 6):
        p = params[f"classifier.{i}"]
        if ctx is not None:
            h = ctx.dense(f"classifier.{i}", p, h)
        else:
            h = jnp.dot(h, p["w"]) + p["b"]
        if i != 6:
            h = jax.nn.relu(h)
    return h


def conv_specs(image: int = 224):
    specs = []
    s = image
    for kind, idx, in_ch, out_ch in _feature_layers():
        if kind == "pool":
            s //= 2
        else:
            specs.append(
                ConvSpec(f"features.{idx}", in_ch, out_ch, 3, 3, 1,
                         out_h=s, out_w=s)
            )
    return specs


def dense_specs():
    return [(f"classifier.{i}", fi, fo)
            for i, (fi, fo) in zip((0, 3, 6), _CLASSIFIER)]
