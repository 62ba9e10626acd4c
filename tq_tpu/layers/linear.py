"""TR dense layer: weight term-revealing + two-phase input quantization.

Behavioural spec: ``TRLinearLayer`` (tr_layer.py:134-160).  Differences by
design:
  * weights are stored (in_features, out_features) — the natural layout
    for ``x @ w`` on the MXU — with the term-reveal grouping on the
    input-feature axis (axis 0), matching the reference's grouping along
    dim 1 of its (out, in) weights;
  * ``TRParams.quantize_input`` controls whether the quantized or the raw
    activations feed the matmul.  The reference has a bug here — it
    computes ``xq`` and then uses ``x`` (tr_layer.py:153-154) — so
    reference-parity sweeps set ``quantize_input=False`` for dense layers
    while the fixed default actually quantizes.
"""

from __future__ import annotations

import jax.numpy as jnp

from tq_tpu.layers.common import TRParams, quantize_weight
from tq_tpu.layers.quantize import (
    CalibConfig,
    act_quantize,
    histogram_update,
    init_histogram,
    mse_search_scale,
)

__all__ = [
    "tr_dense_convert",
    "tr_dense_apply",
    "pack_dense_weights",
    "init_quant_state",
    "finalize_quant_state",
]


def init_quant_state(cfg: CalibConfig = CalibConfig()):
    """Per-quantizer state: calibration histogram + resolved scale."""
    return {"hist": init_histogram(cfg), "sf": jnp.float32(1.0)}


def finalize_quant_state(qs, data_bits: int, data_terms: int,
                         cfg: CalibConfig = CalibConfig()):
    """``finish_tracking`` (tr_layer.py:101-104): histogram -> MSE scale."""
    return {
        "hist": qs["hist"],
        "sf": mse_search_scale(qs["hist"], data_bits, data_terms, cfg),
    }


def tr_dense_convert(params, tr: TRParams):
    """Quantize a dense layer's weights once (tr_layer.py:145-149).

    ``params``: {'w': (in, out), 'b': (out,) or None}.
    Returns params with term-revealed 'w' plus 'w_sf'.
    """
    w_q, w_sf = quantize_weight(params["w"], tr, axis=0)
    out = dict(params)
    out["w"] = w_q
    out["w_sf"] = w_sf
    return out


def pack_dense_weights(qp, tr: TRParams, fmt: str = "int",
                       checks: list | None = None):
    """Pack a converted dense layer's weights into narrow integers.

    Serving-time transform: the term-revealed fp32 weights become int8
    (<= 7-bit weight grids) or int16, cutting weight HBM traffic 2-4x.
    ``tr_dense_apply`` detects packed weights and dequantizes in the
    fused kernel's epilogue; when both the weight grid and
    ``tr.data_bits`` fit int8, the matmul runs on the int8 MXU (2x the
    bf16 rate, exact int32 accumulation).

    ``fmt='u8s'`` (8-bit grids only) packs to 9 bits/weight
    (:class:`~tq_tpu.kernels.term_matmul.PackedWeight8`) instead of
    int16 — 1.78x less weight HBM, decoded in the fused kernel's VMEM.
    Pick it for weight-HBM-bound serving (small batch: token-by-token
    generation); measured 2.0x over int16 and 1.3x over the plain bf16
    dot on the decoder projection at M=64 (PERF.md).  For the
    output-bound wide-N eval shapes (M in the thousands) keep 'int':
    it unlocks the XLA wide-N route below, which wins there.
    """
    from tq_tpu.kernels.term_matmul import pack_weight_int, pack_weight_u8s

    out = dict(qp)
    if fmt == "u8s":
        out["w"] = pack_weight_u8s(qp["w"], qp["w_sf"], tr.weight_bits,
                                   checks=checks)
        out["w_sf"] = out["w"].w_sf
    elif fmt == "int":
        w_int, w_sf = pack_weight_int(qp["w"], qp["w_sf"], tr.weight_bits,
                                      checks=checks)
        out["w"] = w_int
        out["w_sf"] = w_sf
    else:
        raise ValueError(f"unknown pack fmt {fmt!r} (want 'int' or 'u8s')")
    return out


def tr_dense_apply(qp, tr: TRParams, qs, x, track: bool,
                   use_fused: bool | None = None):
    """Forward through a converted dense layer.

    track=True  (phase 1): accumulate the input histogram, compute with
                raw inputs (tr_layer.py:90-94).
    track=False (phase 2): fake-quantize inputs per element with the
                calibrated scale (unless tr.quantize_input is False,
                reproducing the reference's TRLinearLayer), then matmul.
                On TPU the quantize+matmul runs as ONE fused Pallas
                kernel (``use_fused``; auto on TPU for 2-D inputs) so
                the quantized activations never touch HBM.

    Returns (y, updated_qs).
    """
    import jax

    from tq_tpu.kernels.term_matmul import PackedWeight8

    w = qp["w"]
    w_packed8 = isinstance(w, PackedWeight8)
    w_packed = w_packed8 or jnp.issubdtype(w.dtype, jnp.integer)
    if track:
        qs = {**qs, "hist": histogram_update(qs["hist"], x)}
        xq = x
    elif tr.quantize_input:
        if (w_packed and not w_packed8 and x.ndim == 2
                and x.shape[0] >= 256
                and tr.weight_bits <= 8
                and tr.data_bits <= 8 and w.shape[1] >= 4 * w.shape[0]
                and use_fused is None):
            # (The M >= 256 guard: at small M — token-by-token
            # generation — the matmul is weight-HBM-bound and XLA's
            # int->bf16 conversion materializes a second copy of the
            # weights; the fused kernel streams them once.  Measured at
            # M=1: fused int16 ~102us vs this route ~300us+,
            # scripts/bench_generate.py.)
            # Wide-N integer-exact bf16 path (e.g. the LSTM decoder,
            # 650 -> 33278): the output tensor dominates HBM traffic,
            # so the fused kernel's saved activation round-trip is
            # negligible while XLA's matmul streams faster (measured
            # 692us fp32 dot / 715us best fused vs ~410us here at the
            # decoder shape, scripts/bench_lstm_decoder.py).  Exact:
            # quantized magnitudes <= 2^8 and <= 8-bit weight grids are
            # integers <= 256, bf16-exact; scales fold into the epilogue.
            from tq_tpu.ops.term_reveal import term_reveal_elementwise_int

            xi = term_reveal_elementwise_int(
                x, qs["sf"], tr.data_bits, tr.data_terms
            ).astype(jnp.bfloat16)
            y = jnp.dot(xi, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            y = y * (qs["sf"] * qp["w_sf"])
            if qp.get("b") is not None:
                y = y + qp["b"]
            return y, qs
        if use_fused is None:
            use_fused = (w_packed or jax.default_backend() == "tpu") \
                and x.ndim == 2
        if use_fused:
            from tq_tpu.kernels.term_matmul import term_matmul

            int8 = bool(not w_packed8 and w.dtype == jnp.int8
                        and tr.data_bits <= 7)
            # bf16 MXU is exact whenever both integer grids fit 8 bits
            # (magnitudes <= 256 are bf16-exact) — that covers int16-
            # packed 8-bit weight grids too, at ~1.6x the f32 MXU rate.
            bf16 = (not int8 and w_packed
                    and tr.weight_bits <= 8 and tr.data_bits <= 8)
            y = term_matmul(x, w, qs["sf"], tr.data_bits, tr.data_terms,
                            int8=int8, bf16=bf16,
                            w_sf=(qp["w_sf"] if w_packed and not w_packed8
                                  else None))
            if qp.get("b") is not None:
                y = y + qp["b"]
            return y, qs
        xq = act_quantize(x, qs["sf"], tr.data_bits, tr.data_terms)
    else:
        xq = x
    if (not track and not tr.quantize_input and w_packed and x.ndim == 2
            and use_fused is not False):
        # Raw-input serving with packed weights (the reference's
        # TRLinearLayer forward bug, quantize_input=False): stream the
        # narrow weights and decode them in the kernel's VMEM instead
        # of materializing a full fp copy in HBM (2x at the decoder
        # shape, scripts/bench_generate.py).  f32 MXU: same math as
        # the jnp fallback up to scale-association rounding.
        from tq_tpu.kernels.term_matmul import term_matmul

        y = term_matmul(x, w, jnp.float32(1.0), tr.data_bits,
                        tr.data_terms, quantize_x=False,
                        w_sf=qp["w_sf"] if not w_packed8 else None)
        if qp.get("b") is not None:
            y = y + qp["b"]
        return y, qs
    if w_packed8:  # non-fused fallback: decode the 9-bit pack
        from tq_tpu.kernels.term_matmul import unpack_weight_u8s

        w = unpack_weight_u8s(w, k=xq.shape[-1])
    elif w_packed:  # non-fused fallback: dequantize on the fly
        w = w.astype(jnp.float32) * qp["w_sf"]
    y = jnp.dot(xq, w, preferred_element_type=jnp.float32)
    if qp.get("b") is not None:
        y = y + qp["b"]
    return y, qs
