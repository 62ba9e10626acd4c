"""TR conv layer: NHWC/HWIO convolution with term-revealed weights.

Behavioural spec: ``TRConv2dLayer`` (tr_layer.py:106-132).  TPU-native
choices: activations are NHWC and kernels HWIO (XLA's preferred TPU conv
layout); the term-reveal grouping runs along the input-channel axis
(axis 2 of HWIO), which is exactly the reference's grouping along dim 1
of its OIHW weights — g consecutive input channels at a fixed output
channel and kernel position (tr_cuda_kernel.cu:80-90).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tq_tpu.layers.common import TRParams, quantize_weight
from tq_tpu.layers.quantize import act_quantize, histogram_update

__all__ = ["tr_conv_convert", "tr_conv_apply", "pack_conv_weights", "conv2d"]


def conv2d(x, w, stride=(1, 1), padding="SAME", groups: int = 1,
           preferred_element_type=jnp.float32):
    """NHWC x HWIO -> NHWC convolution."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=preferred_element_type,
    )


def tr_conv_convert(params, tr: TRParams):
    """Quantize conv weights once at conversion (tr_layer.py:117-121).

    ``params``: {'w': (kh, kw, in_ch/groups, out_ch), 'b': (out_ch,)|None}.
    """
    w_q, w_sf = quantize_weight(params["w"], tr, axis=2)
    out = dict(params)
    out["w"] = w_q
    out["w_sf"] = w_sf
    return out


def pack_conv_weights(qp, tr: TRParams, checks: list | None = None):
    """Pack a converted conv layer's weights into narrow integers.

    Serving-time transform (see :func:`pack_dense_weights`): int8 for
    <= 7-bit weight grids, int16 up to 15 bits.  ``tr_conv_apply``
    detects packed weights; when activations also fit int8
    (``tr.data_bits <= 7``) the convolution runs int8 x int8 -> int32
    on the MXU (2x bf16 rate, EXACT accumulation) with the combined
    ``sf * w_sf`` dequant applied to the int32 output.
    """
    from tq_tpu.kernels.term_matmul import pack_weight_int

    w_int, w_sf = pack_weight_int(qp["w"], qp["w_sf"], tr.weight_bits,
                                  checks=checks)
    out = dict(qp)
    out["w"] = w_int
    out["w_sf"] = w_sf
    return out


def tr_conv_apply(
    qp,
    tr: TRParams,
    qs,
    x,
    track: bool,
    stride: Sequence[int] = (1, 1),
    padding="SAME",
    groups: int = 1,
    compute_dtype=None,
):
    """Two-phase forward of a converted conv layer (tr_layer.py:124-126).

    ``compute_dtype`` (e.g. bf16) casts both MXU operands after
    quantization AND emits the conv output in that dtype (f32
    accumulation inside the MXU either way).  With the whole graph in
    bf16 (see ``make_cnn_apply``) every inter-layer activation tensor
    moves through HBM at 2 bytes instead of 4 — the model is
    activation-bandwidth-bound (PERF.md roofline), so this halves the
    dominant cost.  Rounding: quantized integers >| 256 and dequantized
    products round to 8 mantissa bits — the same rounding the MXU
    applies to f32 operands on this chip (`xla_allow_excess_precision`),
    so serving error class is unchanged.  Default None = fp32 tensors
    (the reference's fake-quant + fp32 cuDNN structure; the parity
    path).

    Integer-packed weights (:func:`pack_conv_weights`) dispatch the
    int8 MXU path when ``tr.data_bits <= 7``; otherwise they are
    dequantized on the fly.

    Returns (y, updated_qs).
    """
    w = qp["w"]
    w_packed = jnp.issubdtype(w.dtype, jnp.integer)
    if (w_packed and w.dtype == jnp.int8 and tr.data_bits <= 7
            and not track and tr.quantize_input):
        # True integer serving conv: int8 x int8 -> int32, exact.
        from tq_tpu.ops.term_reveal import term_reveal_elementwise_int

        xi = term_reveal_elementwise_int(
            x, qs["sf"], tr.data_bits, tr.data_terms).astype(jnp.int8)
        y = conv2d(xi, w, stride, padding, groups,
                   preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (qs["sf"] * qp["w_sf"])
        if qp.get("b") is not None:
            y = y + qp["b"]
        if compute_dtype is not None:
            y = y.astype(compute_dtype)
        return y, qs
    if w_packed:  # int16 grid or ineligible phase: dequantize on the fly
        w = w.astype(jnp.float32) * qp["w_sf"]
    if track:
        qs = {**qs, "hist": histogram_update(qs["hist"], x)}
        xq = x
    elif tr.quantize_input:
        xq = act_quantize(x, qs["sf"], tr.data_bits, tr.data_terms)
    else:
        xq = x
    pet = jnp.float32
    if compute_dtype is not None and not track:
        xq = xq.astype(compute_dtype)
        w = w.astype(compute_dtype)
        pet = compute_dtype
    y = conv2d(xq, w, stride, padding, groups, preferred_element_type=pet)
    if qp.get("b") is not None:
        y = y + qp["b"].astype(pet)
    return y, qs
