"""MobileNet-V2 (torchvision graph), NHWC functional JAX implementation.

Reference source: ``torchvision.models.mobilenet_v2`` at
``cnn_models/__init__.py:10``.  The depthwise convs (``groups > 1``) are
the layers the reference's conversion policy exempts
(``static_conv_layer_settings``, ``cnn_models/__init__.py:57``) and the
op counter skips (``profile_model.py:25-26``); the spec table marks them
via ``groups`` so both behaviours reproduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tq_tpu.layers.qctx import QuantCtx
from tq_tpu.models.cnn_common import ConvSpec, bn_init, batch_norm, conv_init, dense_init

# t (expansion), c (out channels), n (repeats), s (first stride)
_SETTING = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
NUM_CLASSES = 1000

__all__ = ["init", "apply", "conv_specs", "dense_specs"]


def _blocks():
    """Yield (block_idx, in_ch, out_ch, stride, expand_t) in order."""
    idx = 1
    in_ch = 32
    for t, c, n, s in _SETTING:
        for i in range(n):
            yield idx, in_ch, c, (s if i == 0 else 1), t
            in_ch = c
            idx += 1


def _block_convs(idx, in_ch, out_ch, stride, t):
    """(name, in, out, k, stride, groups) for one inverted residual."""
    hidden = in_ch * t
    if t == 1:
        return [
            (f"features.{idx}.conv.0.0", hidden, hidden, 3, stride, hidden),
            (f"features.{idx}.conv.1", hidden, out_ch, 1, 1, 1),
        ]
    return [
        (f"features.{idx}.conv.0.0", in_ch, hidden, 1, 1, 1),
        (f"features.{idx}.conv.1.0", hidden, hidden, 3, stride, hidden),
        (f"features.{idx}.conv.2", hidden, out_ch, 1, 1, 1),
    ]


def _block_bns(idx, t):
    if t == 1:
        return [f"features.{idx}.conv.0.1", f"features.{idx}.conv.2"]
    return [
        f"features.{idx}.conv.0.1",
        f"features.{idx}.conv.1.1",
        f"features.{idx}.conv.3",
    ]


def init(rng):
    params = {}
    rng, k = jax.random.split(rng)
    params["features.0.0"] = conv_init(k, 3, 3, 3, 32)
    params["features.0.1"] = bn_init(32)
    for idx, in_ch, out_ch, stride, t in _blocks():
        convs = _block_convs(idx, in_ch, out_ch, stride, t)
        bns = _block_bns(idx, t)
        for (name, ci, co, kk, s, g), bn_name in zip(convs, bns):
            rng, key = jax.random.split(rng)
            params[name] = conv_init(key, kk, kk, ci, co, groups=g)
            params[bn_name] = bn_init(co)
    rng, k1, k2 = jax.random.split(rng, 3)
    params["features.18.0"] = conv_init(k1, 1, 1, 320, 1280)
    params["features.18.1"] = bn_init(1280)
    params["classifier.1"] = dense_init(k2, 1280, NUM_CLASSES)
    return params


def _relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def apply(params, x, ctx: QuantCtx | None = None):
    from tq_tpu.layers.conv import conv2d

    def cv(name, h, stride, groups, k):
        pad = (k - 1) // 2
        p = params[name]
        if ctx is not None:
            return ctx.conv(name, p, h, stride=(stride, stride),
                            padding=[(pad, pad), (pad, pad)], groups=groups)
        return conv2d(h, p["w"], (stride, stride),
                      [(pad, pad), (pad, pad)], groups)

    h = cv("features.0.0", x, 2, 1, 3)
    h = _relu6(batch_norm(params["features.0.1"], h))
    for idx, in_ch, out_ch, stride, t in _blocks():
        inp = h
        convs = _block_convs(idx, in_ch, out_ch, stride, t)
        bns = _block_bns(idx, t)
        for j, ((name, ci, co, kk, s, g), bn_name) in enumerate(zip(convs, bns)):
            h = cv(name, h, s, g, kk)
            h = batch_norm(params[bn_name], h)
            if j < len(convs) - 1:  # no activation after the linear projection
                h = _relu6(h)
        if stride == 1 and in_ch == out_ch:
            h = h + inp
    h = cv("features.18.0", h, 1, 1, 1)
    h = _relu6(batch_norm(params["features.18.1"], h))
    h = jnp.mean(h, axis=(1, 2))
    if ctx is not None:
        return ctx.dense("classifier.1", params["classifier.1"], h)
    p = params["classifier.1"]
    return jnp.dot(h, p["w"]) + p["b"]


def conv_specs(image: int = 224):
    specs = []
    s = (image + 1) // 2  # stem stride 2, pad 1, k3
    specs.append(ConvSpec("features.0.0", 3, 32, 3, 3, 2, out_h=s, out_w=s))
    for idx, in_ch, out_ch, stride, t in _blocks():
        for name, ci, co, kk, st, g in _block_convs(idx, in_ch, out_ch, stride, t):
            if st == 2:
                s = (s + 1) // 2
            specs.append(ConvSpec(name, ci, co, kk, kk, st, groups=g,
                                  out_h=s, out_w=s))
    specs.append(ConvSpec("features.18.0", 320, 1280, 1, 1, 1, out_h=s, out_w=s))
    return specs


def dense_specs():
    return [("classifier.1", 1280, NUM_CLASSES)]
