"""EfficientNet-B0 (efficientnet_pytorch graph), NHWC functional JAX.

Reference source: ``EfficientNet.from_pretrained('efficientnet-b0')`` at
``cnn_models/__init__.py:21-25``.  Param names mirror the
efficientnet_pytorch module tree (``_conv_stem``, ``_blocks.N._*``,
``_conv_head``, ``_fc``).

TPU-native notes: the repo's ``Conv2dStaticSamePadding`` exists to give
torch TensorFlow-style SAME padding — XLA's ``padding='SAME'`` IS that
semantics, so no special layer is needed.  BN eps is 1e-3 (not torch's
1e-5).  Activation is swish/SiLU.  The SE 1x1 convs carry biases and are
exempted by the conversion policy ('se' in name,
``cnn_models/__init__.py:57``), as is the depthwise conv (groups > 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tq_tpu.layers.qctx import QuantCtx
from tq_tpu.models.cnn_common import ConvSpec, batch_norm, bn_init, conv_init, dense_init

# b0 blocks: (repeats, kernel, stride, expand, in_ch, out_ch, se_ratio)
_BLOCK_ARGS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]
NUM_CLASSES = 1000
BN_EPS = 1e-3
IMAGE_SIZE = 224

__all__ = ["init", "apply", "conv_specs", "dense_specs", "IMAGE_SIZE"]


def _blocks():
    """Yield (idx, in_ch, out_ch, k, stride, expand, se_ch) in order."""
    idx = 0
    for repeats, k, stride, expand, in_ch, out_ch, se in _BLOCK_ARGS:
        for i in range(repeats):
            ci = in_ch if i == 0 else out_ch
            s = stride if i == 0 else 1
            se_ch = max(1, int(ci * se))
            yield idx, ci, out_ch, k, s, expand, se_ch
            idx += 1


def init(rng):
    params = {}
    rng, k = jax.random.split(rng)
    params["_conv_stem"] = conv_init(k, 3, 3, 3, 32)
    params["_bn0"] = bn_init(32)
    for idx, ci, co, kk, s, e, se_ch in _blocks():
        pre = f"_blocks.{idx}"
        hidden = ci * e
        keys = jax.random.split(rng, 6)
        rng = keys[0]
        if e != 1:
            params[f"{pre}._expand_conv"] = conv_init(keys[1], 1, 1, ci, hidden)
            params[f"{pre}._bn0"] = bn_init(hidden)
        params[f"{pre}._depthwise_conv"] = conv_init(
            keys[2], kk, kk, hidden, hidden, groups=hidden
        )
        params[f"{pre}._bn1"] = bn_init(hidden)
        params[f"{pre}._se_reduce"] = conv_init(keys[3], 1, 1, hidden, se_ch, bias=True)
        params[f"{pre}._se_expand"] = conv_init(keys[4], 1, 1, se_ch, hidden, bias=True)
        params[f"{pre}._project_conv"] = conv_init(keys[5], 1, 1, hidden, co)
        params[f"{pre}._bn2"] = bn_init(co)
    rng, k1, k2 = jax.random.split(rng, 3)
    params["_conv_head"] = conv_init(k1, 1, 1, 320, 1280)
    params["_bn1"] = bn_init(1280)
    params["_fc"] = dense_init(k2, 1280, NUM_CLASSES)
    return params


def apply(params, x, ctx: QuantCtx | None = None):
    from tq_tpu.layers.conv import conv2d

    def cv(name, h, stride=1, groups=1):
        p = params[name]
        if ctx is not None:
            return ctx.conv(name, p, h, stride=(stride, stride),
                            padding="SAME", groups=groups)
        y = conv2d(h, p["w"], (stride, stride), "SAME", groups)
        if p.get("b") is not None:
            y = y + p["b"]
        return y

    swish = jax.nn.silu
    h = swish(batch_norm(params["_bn0"], cv("_conv_stem", x, 2), BN_EPS))
    for idx, ci, co, kk, s, e, se_ch in _blocks():
        pre = f"_blocks.{idx}"
        inp = h
        hidden = ci * e
        if e != 1:
            h = swish(batch_norm(params[f"{pre}._bn0"],
                                 cv(f"{pre}._expand_conv", h), BN_EPS))
        h = swish(batch_norm(params[f"{pre}._bn1"],
                             cv(f"{pre}._depthwise_conv", h, s, hidden), BN_EPS))
        # Squeeze-excite (global pool -> reduce -> swish -> expand -> sigmoid).
        z = jnp.mean(h, axis=(1, 2), keepdims=True)
        z = swish(cv(f"{pre}._se_reduce", z))
        z = jax.nn.sigmoid(cv(f"{pre}._se_expand", z))
        h = h * z
        h = batch_norm(params[f"{pre}._bn2"], cv(f"{pre}._project_conv", h), BN_EPS)
        if s == 1 and ci == co:
            h = h + inp
    h = swish(batch_norm(params["_bn1"], cv("_conv_head", h), BN_EPS))
    h = jnp.mean(h, axis=(1, 2))
    if ctx is not None:
        return ctx.dense("_fc", params["_fc"], h)
    p = params["_fc"]
    return jnp.dot(h, p["w"]) + p["b"]


def conv_specs(image: int = IMAGE_SIZE):
    specs = []
    s = -(-image // 2)  # SAME stride-2
    specs.append(ConvSpec("_conv_stem", 3, 32, 3, 3, 2, out_h=s, out_w=s))
    for idx, ci, co, kk, st, e, se_ch in _blocks():
        pre = f"_blocks.{idx}"
        hidden = ci * e
        if e != 1:
            specs.append(ConvSpec(f"{pre}._expand_conv", ci, hidden, 1, 1, 1,
                                  out_h=s, out_w=s))
        if st == 2:
            s = -(-s // 2)
        specs.append(ConvSpec(f"{pre}._depthwise_conv", hidden, hidden, kk, kk,
                              st, groups=hidden, out_h=s, out_w=s))
        specs.append(ConvSpec(f"{pre}._se_reduce", hidden, se_ch, 1, 1, 1,
                              out_h=1, out_w=1, is_se=True))
        specs.append(ConvSpec(f"{pre}._se_expand", se_ch, hidden, 1, 1, 1,
                              out_h=1, out_w=1, is_se=True))
        specs.append(ConvSpec(f"{pre}._project_conv", hidden, co, 1, 1, 1,
                              out_h=s, out_w=s))
    specs.append(ConvSpec("_conv_head", 320, 1280, 1, 1, 1, out_h=s, out_w=s))
    return specs


def dense_specs():
    return [("_fc", 1280, NUM_CLASSES)]
