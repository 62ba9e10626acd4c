"""TR LSTM: multi-layer LSTM via lax.scan with term-revealed weights.

Behavioural spec: ``TRLSTMLayer`` (tr_layer.py:162-201) wrapping a 2-layer
cuDNN LSTM.  Faithful details:
  * only *layer 0*'s ``w_ih``/``w_hh`` are term-revealed by default — the
    reference never touches ``weight_*_l1`` (tr_layer.py:174-186); pass
    ``quantize_layers=range(n)`` for the fixed behaviour;
  * each weight gets its own scale (the reference overwrites its ``w_sf``
    attribute (tr_layer.py:177,184) but each ``tr`` call already used its
    own fresh scale; the stale buffer is only read by a no-op hook);
  * ONE shared activation quantizer handles the embedding sequence and
    both incoming hidden tensors (h and c) per forward chunk — quantized
    once per bptt chunk, not per timestep (tr_layer.py:191-195);
  * gate order follows the torch convention (i, f, g, o) so torch
    checkpoints import directly.

TPU-native: the time loop is a single ``lax.scan`` per layer (static
shapes, no Python-per-step dispatch); the 4 gate matmuls are fused into
one ``(B, in) @ (in, 4H)`` MXU matmul.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tq_tpu.layers.common import TRParams, quantize_weight
from tq_tpu.layers.quantize import act_quantize, histogram_update

__all__ = ["lstm_init", "lstm_apply", "rnn_init", "rnn_apply",
           "tr_lstm_convert", "tr_lstm_apply", "tr_lstm_pack", "GATE_MULT"]

# Gate-matrix width multiplier per recurrent cell type.  The reference's
# RNNModel supports all four (lstm_models/model.py:14-22: nn.LSTM /
# nn.GRU / nn.RNN with tanh or relu nonlinearity); sweeps only ever used
# LSTM, but main.py trains any of them through the same loop.
GATE_MULT = {"LSTM": 4, "GRU": 3, "RNN_TANH": 1, "RNN_RELU": 1}


def rnn_init(rng, input_size: int, hidden: int, num_layers: int,
             cell: str = "LSTM"):
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, torch-style, any cell type."""
    G = GATE_MULT[cell]
    k = 1.0 / jnp.sqrt(hidden)
    layers = []
    for i in range(num_layers):
        in_sz = input_size if i == 0 else hidden
        rng, *sub = jax.random.split(rng, 5)
        layers.append(
            {
                "w_ih": jax.random.uniform(sub[0], (in_sz, G * hidden), minval=-k, maxval=k),
                "w_hh": jax.random.uniform(sub[1], (hidden, G * hidden), minval=-k, maxval=k),
                "b_ih": jax.random.uniform(sub[2], (G * hidden,), minval=-k, maxval=k),
                "b_hh": jax.random.uniform(sub[3], (G * hidden,), minval=-k, maxval=k),
            }
        )
    return layers


def lstm_init(rng, input_size: int, hidden: int, num_layers: int):
    return rnn_init(rng, input_size, hidden, num_layers, "LSTM")


def _proj(x2, w, w_sf=None):
    """``x2 @ w`` for any serving weight layout.

    fp32 weights multiply directly; bf16 weights cast the activations
    too (on this chip f32 MXU operands already round to 8 mantissa bits
    under ``--xla_allow_excess_precision``, so bf16 weights are the same
    rounding class at half the HBM traffic).  Integer (int8/int16) and
    :class:`PackedWeight8` weights stream narrow through the fused
    kernel's raw-input mode (``quantize_x=False``) and decode inside
    VMEM — the formats :func:`tr_lstm_pack` produces for weight-HBM
    -bound token-by-token generation, where the fp32 recurrent weights
    were ~40% of the per-step traffic (PERF.md round 3).
    """
    from tq_tpu.kernels.term_matmul import PackedWeight8, term_matmul

    packed8 = isinstance(w, PackedWeight8)
    if (packed8 or jnp.issubdtype(w.dtype, jnp.integer)
            or w.dtype == jnp.bfloat16):
        n = (w.lo if packed8 else w).shape[1]
        # One j step when 4H fits a single tile: the gate dim (<= 4096
        # for every config here) padded to the lane width wastes < 4%
        # vs the default bn=512's up-to-18% pad at 4H=2600.  (bf16
        # weights go through the kernel too: XLA's small-M bf16 matmul
        # measured 2x SLOWER than fp32 — it materializes a layout
        # conversion — while the kernel streams 2-byte tiles and widens
        # in VMEM.)
        bn = -(-n // 128) * 128
        return term_matmul(
            x2, w, jnp.float32(1.0), quantize_x=False,
            w_sf=w_sf if (w_sf is not None
                          and not packed8
                          and jnp.issubdtype(w.dtype, jnp.integer))
            else None,
            bn=bn if bn <= 4096 else 512)
    return jnp.dot(x2, w, preferred_element_type=jnp.float32)


def _cell_scan(layer_params, x_seq, h0, c0=None, cell: str = "LSTM"):
    """One recurrent layer over the full sequence: (T, B, in) -> (T, B, H).

    Torch gate conventions per cell so checkpoints import directly:
    LSTM (i, f, g, o); GRU (r, z, n) with the n-gate's recurrent bias
    kept *inside* the reset product (``n = tanh(gi_n + r*(h@W_hn +
    b_hn))``, why ``b_ih``/``b_hh`` cannot be merged for GRU); vanilla
    RNN ``h' = act(x@W_ih + h@W_hh + b)``.  ``c0`` is LSTM-only.
    """
    w_ih, w_hh = layer_params["w_ih"], layer_params["w_hh"]
    H = h0.shape[-1]
    T, B = x_seq.shape[0], x_seq.shape[1]
    G = GATE_MULT[cell]
    # Input projection hoisted out of the scan: one (T*B, in) @ (in, GH)
    # MXU matmul instead of T small ones — T-fold fewer weight streams
    # from HBM and full MXU tiles.  Only the recurrent h @ w_hh stays
    # per-step; it is the true serial dependence.  b_ih folds into the
    # hoisted term for every cell (it never meets the reset gate).
    xw_seq = (_proj(x_seq.reshape(T * B, -1), w_ih,
                    layer_params.get("w_ih_sf")).reshape(T, B, G * H)
              + layer_params["b_ih"])
    w_hh_sf = layer_params.get("w_hh_sf")
    b_hh = layer_params["b_hh"]

    if cell == "LSTM":
        def step(carry, xw_t):
            h, c = carry
            gates = xw_t + _proj(h, w_hh, w_hh_sf) + b_hh
            i, f, g, o = (
                gates[:, :H],
                gates[:, H : 2 * H],
                gates[:, 2 * H : 3 * H],
                gates[:, 3 * H :],
            )
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (hT, cT), out = jax.lax.scan(step, (h0, c0), xw_seq)
        return out, hT, cT

    if cell == "GRU":
        def step(h, xw_t):
            gh = _proj(h, w_hh, w_hh_sf) + b_hh
            r = jax.nn.sigmoid(xw_t[:, :H] + gh[:, :H])
            z = jax.nn.sigmoid(xw_t[:, H : 2 * H] + gh[:, H : 2 * H])
            n = jnp.tanh(xw_t[:, 2 * H :] + r * gh[:, 2 * H :])
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        hT, out = jax.lax.scan(step, h0, xw_seq)
        return out, hT, None

    act = jnp.tanh if cell == "RNN_TANH" else jax.nn.relu

    def step(h, xw_t):
        h_new = act(xw_t + _proj(h, w_hh, w_hh_sf) + b_hh)
        return h_new, h_new

    hT, out = jax.lax.scan(step, h0, xw_seq)
    return out, hT, None


def rnn_apply(params, x_seq, hidden, cell: str = "LSTM"):
    """Multi-layer recurrent stack.  ``hidden`` = (h, c) each (L, B, H)
    for LSTM (torch convention), a single (L, B, H) array otherwise."""
    if cell == "LSTM":
        h0, c0 = hidden
        hs, cs = [], []
        out = x_seq
        for i, layer in enumerate(params):
            out, hT, cT = _cell_scan(layer, out, h0[i], c0[i])
            hs.append(hT)
            cs.append(cT)
        return out, (jnp.stack(hs), jnp.stack(cs))
    hs = []
    out = x_seq
    for i, layer in enumerate(params):
        out, hT, _ = _cell_scan(layer, out, hidden[i], cell=cell)
        hs.append(hT)
    return out, jnp.stack(hs)


def lstm_apply(params, x_seq, hidden):
    """Multi-layer LSTM.  ``hidden`` = (h, c) each (L, B, H)."""
    return rnn_apply(params, x_seq, hidden, "LSTM")


def tr_lstm_convert(
    params, tr: TRParams, quantize_layers: Sequence[int] = (0,)
):
    """Term-reveal selected layers' input/recurrent weights.

    Grouping runs along the input-feature axis (axis 0 of our (in, 4H)
    layout == dim 1 of the reference's (4H, in) tensors).
    """
    out = []
    for i, layer in enumerate(params):
        layer = dict(layer)
        if i in quantize_layers:
            for key in ("w_ih", "w_hh"):
                w_q, w_sf = quantize_weight(layer[key], tr, axis=0)
                layer[key] = w_q
                layer[key + "_sf"] = w_sf
        out.append(layer)
    return out


def tr_lstm_pack(qp_rnn, tr: TRParams, fmt: str = "u8s",
                 unquantized_dtype=None, checks: list | None = None):
    """Serving transform: pack the recurrent weights for HBM streaming.

    Token-by-token generation re-reads every recurrent matrix per step
    (the reference's lstm_models/generate.py loop); at the published
    LSTM setting the fp32 ``w_ih``/``w_hh`` were ~40% of the u8s
    generation step's HBM traffic (PERF.md round 3 — VERDICT r3 next
    #2).  Quantized layers (those carrying ``w_*_sf``) pack to the
    9-bit :class:`PackedWeight8` format (``fmt='u8s'``, 8-bit grids) or
    narrow ints (``fmt='int'``: int8 for <= 7-bit grids, int16 up to
    15); ``_proj`` streams them through the fused kernel's in-VMEM
    decode.  ``unquantized_dtype=jnp.bfloat16`` additionally casts the
    layers the reference leaves untouched (layer >= 1,
    tr_layer.py:174-186) — halved traffic in the same rounding class as
    this chip's f32 MXU operand rounding (see ``_proj``).
    """
    from tq_tpu.kernels.term_matmul import pack_weight_int, pack_weight_u8s

    out = []
    for layer in qp_rnn:
        layer = dict(layer)
        if "w_ih_sf" in layer:  # a quantized layer
            for key in ("w_ih", "w_hh"):
                sf = layer[key + "_sf"]
                if fmt == "u8s" and tr.weight_bits <= 8:
                    wp = pack_weight_u8s(layer[key], sf, tr.weight_bits,
                                         checks=checks)
                    layer[key], layer[key + "_sf"] = wp, wp.w_sf
                elif tr.weight_bits <= 15:
                    w_int, w_sf = pack_weight_int(layer[key], sf,
                                                  tr.weight_bits,
                                                  checks=checks)
                    layer[key], layer[key + "_sf"] = w_int, w_sf
                # > 15-bit grids stay fp32 (nothing narrower fits).
        elif unquantized_dtype is not None:
            for key in ("w_ih", "w_hh"):
                layer[key] = layer[key].astype(unquantized_dtype)
        out.append(layer)
    return out


def tr_lstm_apply(qp, tr: TRParams, qs, x_seq, hidden, track: bool,
                  cell: str = "LSTM"):
    """Two-phase forward (tr_layer.py:191-195).

    One shared quantizer for the embedding sequence and every hidden
    tensor (h and c for LSTM, h alone for GRU/RNN — the reference only
    ever wrapped nn.LSTM, so the single-hidden case follows the same
    shared-quantizer rule); applied once per chunk.  Returns
    (out, new_hidden, new_qs).
    """
    parts = (x_seq, *hidden) if cell == "LSTM" else (x_seq, hidden)
    if track:
        hist = qs["hist"]
        for t in parts:
            hist = histogram_update(hist, t)
        qs = {**qs, "hist": hist}
    elif tr.quantize_input:
        sf = qs["sf"]
        parts = tuple(act_quantize(t, sf, tr.data_bits, tr.data_terms)
                      for t in parts)
    hidden_q = parts[1:] if cell == "LSTM" else parts[1]
    out, new_hidden = rnn_apply(qp, parts[0], hidden_q, cell)
    return out, new_hidden, qs
