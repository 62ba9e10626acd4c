"""Shared pieces for the CNN model zoo (NHWC / HWIO, functional params).

Each model module exposes:
  * ``init(rng)``            -> param pytree (nested dicts keyed to match
                                the torchvision module names, so torch
                                checkpoints import mechanically)
  * ``apply(params, x, ctx)``-> logits; ``ctx`` is a
                                :class:`tq_tpu.layers.qctx.QuantCtx` or
                                None for plain fp32
  * ``conv_specs(image)``    -> ordered ConvSpec list (conversion policy
                                + the term-MAC profiler both consume it)

Reference conversion semantics being reproduced
(``cnn_models/__init__.py:30-65``): every Conv2d except the stem is
replaced; stem / depthwise (groups > 1) / squeeze-excite layers get the
EXEMPT (16, 1, 16) setting.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ConvSpec",
    "batch_norm",
    "conv_init",
    "dense_init",
    "bn_init",
    "conv_out",
]


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """Static description of one conv layer instance in a model."""

    name: str
    in_ch: int
    out_ch: int
    kh: int
    kw: int
    stride: int = 1
    groups: int = 1
    out_h: int = 0
    out_w: int = 0
    is_se: bool = False  # squeeze-excite 1x1s ('se' in torch module name)

    @property
    def out_elems(self) -> int:
        return self.out_ch * self.out_h * self.out_w


def conv_out(size: int, k: int, stride: int, padding: int) -> int:
    return (size + 2 * padding - k) // stride + 1


def batch_norm(p, x, eps: float = 1e-5):
    """Inference-mode BN over the channel axis of NHWC ``x``."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def conv_init(rng, kh, kw, in_ch, out_ch, groups=1, bias=False):
    """Kaiming-normal HWIO conv params (torch conv default fan-out mode)."""
    fan_out = kh * kw * out_ch // groups
    w = jax.random.normal(rng, (kh, kw, in_ch // groups, out_ch)) * np.sqrt(
        2.0 / fan_out
    )
    p = {"w": w.astype(jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def dense_init(rng, fan_in, fan_out):
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(
            k1, (fan_in, fan_out), minval=-bound, maxval=bound, dtype=jnp.float32
        ),
        "b": jax.random.uniform(
            k2, (fan_out,), minval=-bound, maxval=bound, dtype=jnp.float32
        ),
    }


def bn_init(ch):
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }
