"""Shared TR layer configuration and weight-side quantization.

Reference behaviour: every TR layer computes a per-tensor weight scale
``w_sf = max|w| / 2**(weight_bits - 1)`` and term-reveals its weights once
at conversion time (``tr_layer.py:117-121`` and ``:145-148``, ``:174-186``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from tq_tpu.ops.term_reveal import term_reveal

__all__ = ["TRParams", "weight_scale", "quantize_weight"]


@dataclasses.dataclass(frozen=True)
class TRParams:
    """Quantization settings for one layer.

    Mirrors the reference's positional 5-tuple (weight_bits, group_size,
    weight_terms) + (data_bits, data_terms) threaded through
    ``replace_*_layers`` (e.g. ``cnn_models/__init__.py:30-50``).

    ``quantize_input`` exists because the reference's ``TRLinearLayer``
    forgets to use the quantized activations (``tr_layer.py:154`` passes
    raw ``x``); the fixed behaviour is the default, the reference metric
    parity mode sets it to False for linear layers.
    """

    weight_bits: int = 8
    group_size: int = 1
    weight_terms: int = 8
    data_bits: int = 8
    data_terms: int = 4
    quantize_input: bool = True

    @property
    def alpha(self) -> float:
        return self.weight_terms / self.group_size


# Per-layer settings for exempt layers (first conv, depthwise, squeeze-
# excite): 16 bits, no grouping, 16 terms == effectively unquantized
# (cnn_models/__init__.py:57-59).
EXEMPT = (16, 1, 16)


def weight_scale(w, weight_bits: int):
    """``w_sf = max|w| / 2**(weight_bits - 1)`` (tr_layer.py:118-119)."""
    return jnp.max(jnp.abs(w)) / (2 ** (weight_bits - 1))


@functools.partial(jax.jit, static_argnames=("tr", "axis"))
def quantize_weight(w, tr: TRParams, axis: int):
    """Term-reveal a weight tensor along its input-channel axis.

    Returns ``(w_q, w_sf)``; done once at conversion, mirroring the
    eager weight pass through ``tr_cuda.tr`` in the reference layer
    constructors.  Jitted whole (``tr``/``axis`` static — TRParams is a
    frozen dataclass, hashable) so model conversion costs ONE dispatch
    per tensor instead of several eager ops — under a congested device
    tunnel eager dispatches cost seconds each (BENCH_r04 post-mortem).
    """
    w_sf = weight_scale(w, tr.weight_bits)
    w_q = term_reveal(
        w, w_sf, tr.weight_bits, tr.group_size, tr.weight_terms, axis=axis
    )
    return w_q, w_sf
