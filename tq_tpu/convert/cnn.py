"""Generic CNN conversion: params + conv specs -> TR-quantized model.

Functional equivalent of the reference's module-tree surgery
(``convert_model`` -> ``replace_conv_layers``,
``cnn_models/__init__.py:30-70``): every conv except the stem becomes a
TR layer — weights term-revealed once along the input-channel axis,
activations two-phase calibrated at the global (data_bits, data_terms).
Exempt layers (policy above) still quantize activations, exactly like a
reference ``TRConv2dLayer`` at (16, 1, 16); the stem stays fp32 and
unquantized because the reference never replaces it.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax

from tq_tpu.layers.common import TRParams, quantize_weight
from tq_tpu.layers.linear import finalize_quant_state, init_quant_state
from tq_tpu.layers.qctx import QuantCtx

__all__ = ["convert_cnn", "make_cnn_apply", "finalize_cnn", "pack_cnn"]


def convert_cnn(
    model_mod,
    params,
    settings: Sequence[tuple[int, int, int]],
    data_bits: int,
    data_terms: int,
    image: int | None = None,
):
    """Convert a CNN param tree.

    Args:
      model_mod: model module exposing ``apply`` (and optionally a
        hand-written ``conv_specs()``; otherwise specs are derived by
        tracing — :func:`tq_tpu.profilers.trace_specs.specs_for`).
      params: fp32 param pytree (flat names -> leaves).
      settings: per-conv (weight_bits, group_size, weight_terms), same
        order as ``conv_specs()`` (use
        :func:`tq_tpu.convert.policy.static_conv_layer_settings`).
      data_bits / data_terms: activation quantization, global.

    Returns (qparams, qcfg, qstate); the stem (spec index 0) is left
    untouched and absent from qcfg.
    """
    from tq_tpu.profilers.trace_specs import specs_for

    specs = specs_for(model_mod, image)
    if len(settings) != len(specs):
        raise ValueError(
            f"{len(settings)} settings for {len(specs)} conv layers"
        )
    qparams = dict(params)
    qcfg = {}
    qstate = {}
    for i, (spec, (wb, gs, wt)) in enumerate(zip(specs, settings)):
        if i == 0:
            continue  # stem never replaced (cnn_models/__init__.py:33-36)
        tr = TRParams(
            weight_bits=wb,
            group_size=gs,
            weight_terms=wt,
            data_bits=data_bits,
            data_terms=data_terms,
            quantize_input=True,
        )
        w_q, w_sf = quantize_weight(params[spec.name]["w"], tr, axis=2)
        qparams[spec.name] = {**params[spec.name], "w": w_q, "w_sf": w_sf}
        qcfg[spec.name] = tr
        qstate[spec.name] = init_quant_state()
    return qparams, qcfg, qstate


def make_cnn_apply(model_mod, qcfg, track: bool, compute_dtype=None):
    """Jitted two-phase forward: f(qparams, qstate, x) -> (logits, new_qstate).

    ``qcfg`` is closed over (its TRParams are static); ``track`` picks
    calibration vs quantized eval.  ``compute_dtype=jnp.bfloat16`` is
    the serving mode: every float array in the graph — input batch,
    weights, BN vectors, conv outputs, residual adds — moves at that
    dtype, halving the activation HBM traffic the model is bound by
    (PERF.md roofline); quantization integer math still runs in
    int32/f32 registers inside the fused chains.  Default None matches
    the reference's fp32 fake-quant structure (the parity path).
    """
    import jax.numpy as jnp

    def _cast(tree):
        return jax.tree_util.tree_map(
            lambda l: l.astype(compute_dtype)
            if (hasattr(l, "dtype") and l.dtype == jnp.float32
                and getattr(l, "ndim", 0) >= 1)
            else l,
            tree,
        )

    @jax.jit
    def forward(qparams, qstate, x):
        if compute_dtype is not None and not track:
            qparams = _cast(qparams)
            x = x.astype(compute_dtype)
        ctx = QuantCtx(cfg=qcfg, state=qstate, track=track,
                       compute_dtype=compute_dtype)
        logits = model_mod.apply(qparams, x, ctx)
        new_state = {**qstate, **ctx.out_state}
        return logits, new_state

    return forward


def pack_cnn(qparams, qcfg):
    """Serving transform: pack converted conv weights into narrow ints.

    Layers with weight grids <= 7 bits become int8 (the int8 MXU conv
    path fires when ``data_bits <= 7`` too); <= 15-bit grids become
    int16 (streamed + dequantized on the fly); 16-bit exempt layers
    (depthwise/SE policy rows) stay fp32.  Returns new qparams.
    """
    from tq_tpu.kernels.term_matmul import flush_pack_checks
    from tq_tpu.layers.conv import pack_conv_weights

    out = dict(qparams)
    checks: list = []  # ONE host sync for the whole model (congested-
    # tunnel resilience: per-tensor syncs cost minutes, BENCH_r04)
    for name, tr in qcfg.items():
        if tr.weight_bits > 15:
            continue
        out[name] = pack_conv_weights(qparams[name], tr, checks=checks)
    flush_pack_checks(checks)
    return out


def finalize_cnn(qstate, qcfg):
    """Histogram -> MSE scale search for every converted layer."""
    return {
        name: finalize_quant_state(
            qstate[name], qcfg[name].data_bits, qcfg[name].data_terms
        )
        for name in qstate
    }
