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

__all__ = ["lstm_init", "lstm_apply", "tr_lstm_convert", "tr_lstm_apply"]


def lstm_init(rng, input_size: int, hidden: int, num_layers: int):
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, torch-style."""
    k = 1.0 / jnp.sqrt(hidden)
    layers = []
    for i in range(num_layers):
        in_sz = input_size if i == 0 else hidden
        rng, *sub = jax.random.split(rng, 5)
        layers.append(
            {
                "w_ih": jax.random.uniform(sub[0], (in_sz, 4 * hidden), minval=-k, maxval=k),
                "w_hh": jax.random.uniform(sub[1], (hidden, 4 * hidden), minval=-k, maxval=k),
                "b_ih": jax.random.uniform(sub[2], (4 * hidden,), minval=-k, maxval=k),
                "b_hh": jax.random.uniform(sub[3], (4 * hidden,), minval=-k, maxval=k),
            }
        )
    return layers


def _cell_scan(layer_params, x_seq, h0, c0):
    """One LSTM layer over the full sequence: (T, B, in) -> (T, B, H)."""
    w_ih, w_hh = layer_params["w_ih"], layer_params["w_hh"]
    bias = layer_params["b_ih"] + layer_params["b_hh"]
    H = w_hh.shape[0]

    def step(carry, x_t):
        h, c = carry
        gates = (
            jnp.dot(x_t, w_ih, preferred_element_type=jnp.float32)
            + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
            + bias
        )
        i, f, g, o = (
            gates[:, :H],
            gates[:, H : 2 * H],
            gates[:, 2 * H : 3 * H],
            gates[:, 3 * H :],
        )
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (hT, cT), out = jax.lax.scan(step, (h0, c0), x_seq)
    return out, hT, cT


def lstm_apply(params, x_seq, hidden):
    """Multi-layer LSTM.  ``hidden`` = (h, c) each (L, B, H)."""
    h0, c0 = hidden
    hs, cs = [], []
    out = x_seq
    for i, layer in enumerate(params):
        out, hT, cT = _cell_scan(layer, out, h0[i], c0[i])
        hs.append(hT)
        cs.append(cT)
    return out, (jnp.stack(hs), jnp.stack(cs))


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


def tr_lstm_apply(qp, tr: TRParams, qs, x_seq, hidden, track: bool):
    """Two-phase forward (tr_layer.py:191-195).

    One shared quantizer for the embedding sequence and both hidden
    tensors; applied once per chunk.  Returns (out, new_hidden, new_qs).
    """
    h0, c0 = hidden
    if track:
        hist = qs["hist"]
        hist = histogram_update(hist, x_seq)
        hist = histogram_update(hist, h0)
        hist = histogram_update(hist, c0)
        qs = {**qs, "hist": hist}
        xq, hq, cq = x_seq, h0, c0
    elif tr.quantize_input:
        sf = qs["sf"]
        xq = act_quantize(x_seq, sf, tr.data_bits, tr.data_terms)
        hq = act_quantize(h0, sf, tr.data_bits, tr.data_terms)
        cq = act_quantize(c0, sf, tr.data_bits, tr.data_terms)
    else:
        xq, hq, cq = x_seq, h0, c0
    out, new_hidden = lstm_apply(qp, xq, (hq, cq))
    return out, new_hidden, qs
