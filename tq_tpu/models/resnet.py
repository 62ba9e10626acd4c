"""ResNet-18 (torchvision graph), NHWC functional JAX implementation.

The reference gets this model from ``torchvision.models.resnet18``
(``cnn_models/__init__.py:17-19``) and TR-converts every conv except the
stem.  Param names mirror the torchvision module tree (``conv1``,
``layer1.0.conv2``, ``fc``, ...) so ``tq_tpu.utils.torch_import`` maps
checkpoints over directly and conversion policy tables line up with the
reference's ``named_modules`` walk.
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
    conv_out,
    dense_init,
)

# (blocks per stage, channels per stage) for ResNet-18.
STAGES = ((2, 64), (2, 128), (2, 256), (2, 512))
NUM_CLASSES = 1000

__all__ = ["init", "apply", "conv_specs"]


def _block_names():
    for si, (blocks, ch) in enumerate(STAGES, start=1):
        for bi in range(blocks):
            yield f"layer{si}.{bi}", ch, si, bi


def init(rng):
    params = {}
    rng, k = jax.random.split(rng)
    params["conv1"] = conv_init(k, 7, 7, 3, 64)
    params["bn1"] = bn_init(64)
    in_ch = 64
    for name, ch, si, bi in _block_names():
        downsample = bi == 0 and (si > 1)
        stride = 2 if downsample else 1
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        params[f"{name}.conv1"] = conv_init(k1, 3, 3, in_ch, ch)
        params[f"{name}.bn1"] = bn_init(ch)
        params[f"{name}.conv2"] = conv_init(k2, 3, 3, ch, ch)
        params[f"{name}.bn2"] = bn_init(ch)
        if downsample:
            params[f"{name}.downsample.0"] = conv_init(k3, 1, 1, in_ch, ch)
            params[f"{name}.downsample.1"] = bn_init(ch)
        in_ch = ch
    rng, k = jax.random.split(rng)
    params["fc"] = dense_init(k, 512, NUM_CLASSES)
    return params


def apply(params, x, ctx: QuantCtx | None = None):
    """NHWC forward -> (N, 1000) logits."""
    cv = ctx.conv if ctx is not None else _plain_conv
    h = cv("conv1", params["conv1"], x, stride=(2, 2), padding=[(3, 3), (3, 3)])
    h = jax.nn.relu(batch_norm(params["bn1"], h))
    h = _max_pool(h)
    for name, ch, si, bi in _block_names():
        downsample = bi == 0 and si > 1
        stride = (2, 2) if downsample else (1, 1)
        shortcut = h
        o = cv(f"{name}.conv1", params[f"{name}.conv1"], h,
               stride=stride, padding=[(1, 1), (1, 1)])
        o = jax.nn.relu(batch_norm(params[f"{name}.bn1"], o))
        o = cv(f"{name}.conv2", params[f"{name}.conv2"], o,
               stride=(1, 1), padding=[(1, 1), (1, 1)])
        o = batch_norm(params[f"{name}.bn2"], o)
        if downsample:
            shortcut = cv(f"{name}.downsample.0", params[f"{name}.downsample.0"],
                          h, stride=stride, padding=[(0, 0), (0, 0)])
            shortcut = batch_norm(params[f"{name}.downsample.1"], shortcut)
        h = jax.nn.relu(o + shortcut)
    h = jnp.mean(h, axis=(1, 2))
    if ctx is not None:
        return ctx.dense("fc", params["fc"], h)
    return jnp.dot(h, params["fc"]["w"]) + params["fc"]["b"]


def _plain_conv(name, p, x, stride=(1, 1), padding="SAME", groups=1):
    from tq_tpu.layers.conv import conv2d

    y = conv2d(x, p["w"], stride, padding, groups)
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def _max_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def conv_specs(image: int = 224):
    """Ordered ConvSpec list (stem first), shapes at ``image`` input."""
    specs = []
    s = conv_out(image, 7, 2, 3)
    specs.append(ConvSpec("conv1", 3, 64, 7, 7, 2, out_h=s, out_w=s))
    s = conv_out(s, 3, 2, 1)  # maxpool
    in_ch = 64
    for name, ch, si, bi in _block_names():
        downsample = bi == 0 and si > 1
        stride = 2 if downsample else 1
        s1 = conv_out(s, 3, stride, 1)
        specs.append(ConvSpec(f"{name}.conv1", in_ch, ch, 3, 3, stride,
                              out_h=s1, out_w=s1))
        specs.append(ConvSpec(f"{name}.conv2", ch, ch, 3, 3, 1,
                              out_h=s1, out_w=s1))
        if downsample:
            specs.append(ConvSpec(f"{name}.downsample.0", in_ch, ch, 1, 1,
                                  stride, out_h=s1, out_w=s1))
        s = s1
        in_ch = ch
    return specs


def dense_specs():
    """(name, in_features, out_features) of every linear layer."""
    return [("fc", 512, NUM_CLASSES)]
