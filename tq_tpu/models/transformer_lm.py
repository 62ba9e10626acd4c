"""Transformer language model (reference lstm_models/model.py:108-152).

``TransformerModel``: embedding * sqrt(d) -> sinusoidal positional
encoding -> N post-LN torch ``TransformerEncoderLayer``s (self-attention
with causal mask, ReLU feed-forward) -> linear decoder -> log-softmax.
Eval-mode forward (dropout identity); param names mirror the torch
module tree so checkpoints import via ``tq_tpu.utils.torch_import``.

TR conversion follows the reference's module walk
(``replace_lstm_layers``, evaluate_lstm.py:17-37): every ``nn.Linear``
becomes a TR dense layer — that is the attention ``out_proj``, the two
feed-forward linears, and the decoder (``in_proj`` is a raw Parameter,
not a Linear, so it stays fp32 there and here).  The reference
``TRLinearLayer`` computes-but-drops quantized inputs
(tr_layer.py:153-154); ``quantize_input`` controls that here.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from tq_tpu.layers.common import TRParams
from tq_tpu.layers.linear import (
    finalize_quant_state,
    init_quant_state,
    tr_dense_apply,
    tr_dense_convert,
)

__all__ = ["init", "apply", "apply_train", "convert",
           "decode_init_cache", "decode_step",
           "make_quantized_apply", "make_tp_quantized_apply", "finalize",
           "pack"]


def _layer_names(nlayers: int):
    for i in range(nlayers):
        pre = f"transformer_encoder.layers.{i}"
        yield i, pre


def init(rng, vocab: int = 33278, emsize: int = 650, nhead: int = 2,
         nhid: int = 650, nlayers: int = 2):
    def dense(key, fi, fo):
        bound = 1.0 / math.sqrt(fi)
        k1, k2 = jax.random.split(key)
        return {
            "w": jax.random.uniform(k1, (fi, fo), minval=-bound, maxval=bound),
            "b": jax.random.uniform(k2, (fo,), minval=-bound, maxval=bound),
        }

    params = {}
    rng, k = jax.random.split(rng)
    params["encoder"] = {"w": jax.random.uniform(
        k, (vocab, emsize), minval=-0.1, maxval=0.1)}
    for i, pre in _layer_names(nlayers):
        keys = jax.random.split(rng, 6)
        rng = keys[0]
        params[f"{pre}.self_attn.in_proj"] = dense(keys[1], emsize, 3 * emsize)
        params[f"{pre}.self_attn.out_proj"] = dense(keys[2], emsize, emsize)
        params[f"{pre}.linear1"] = dense(keys[3], emsize, nhid)
        params[f"{pre}.linear2"] = dense(keys[4], nhid, emsize)
        params[f"{pre}.norm1"] = {"scale": jnp.ones(emsize), "bias": jnp.zeros(emsize)}
        params[f"{pre}.norm2"] = {"scale": jnp.ones(emsize), "bias": jnp.zeros(emsize)}
    rng, k = jax.random.split(rng)
    params["decoder"] = dense(k, emsize, vocab)
    return params


def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _positional_encoding(T: int, d: int):
    pos = np.arange(T)[:, None]
    div = np.exp(np.arange(0, d, 2) * (-math.log(10000.0) / d))
    pe = np.zeros((T, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


def _attention(params, pre, x, nhead: int, dropout: float = 0.0,
               dropout_rng=None):
    """Causal multi-head self-attention on (T, B, d).  ``dropout`` (on
    the attention probabilities, torch MultiheadAttention's site) is
    train-mode only."""
    T, B, d = x.shape
    hd = d // nhead
    proj = params[f"{pre}.self_attn.in_proj"]
    qkv = jnp.dot(x, proj["w"]) + proj["b"]  # (T, B, 3d)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # (T, B, d) -> (B, nhead, T, hd)
        return t.reshape(T, B, nhead, hd).transpose(1, 2, 0, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(hd)
    mask = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(mask, scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    if dropout > 0.0:
        keep = 1.0 - dropout
        attn = attn * jax.random.bernoulli(dropout_rng, keep,
                                           attn.shape) / keep
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    out = out.transpose(2, 0, 1, 3).reshape(T, B, d)
    return out


def apply(params, tokens, nhead: int = 2, qcfg=None, qstate=None,
          track=False, decoder_fn=None):
    """(T, B) tokens -> (T*B, vocab) log-probs.

    ``nhead`` is static (the reference default is 2, evaluate_lstm.py
    --nhead).  When ``qcfg`` is given, the out_proj / linear1 / linear2 /
    decoder matmuls run through TR dense layers; returns
    (logp, new_qstate).  ``decoder_fn`` overrides the final decoder
    matmul (tensor-parallel serving routes it through the sharded
    packed kernel, :func:`make_tp_quantized_apply`).
    """
    d = params["encoder"]["w"].shape[1]
    nlayers = sum(1 for k in params if k.endswith(".linear1"))
    T, B = tokens.shape
    new_state = dict(qstate) if qstate is not None else None

    def dense(name, x):
        p = params[name]
        if qcfg is not None and name in qcfg:
            y, qs = tr_dense_apply(p, qcfg[name], new_state[name], x, track)
            new_state[name] = qs
            return y
        return jnp.dot(x, p["w"]) + p["b"]

    h = params["encoder"]["w"][tokens] * math.sqrt(d)
    h = h + _positional_encoding(T, d)[:, None, :]
    for i, pre in _layer_names(nlayers):
        a = _attention(params, pre, h, nhead)
        a = dense(f"{pre}.self_attn.out_proj", a)
        h = _layer_norm(params[f"{pre}.norm1"], h + a)
        f = dense(f"{pre}.linear2", jax.nn.relu(dense(f"{pre}.linear1", h)))
        h = _layer_norm(params[f"{pre}.norm2"], h + f)
    if decoder_fn is not None:
        logits = decoder_fn(h.reshape(T * B, d))
    else:
        logits = dense("decoder", h.reshape(T * B, d))
    logp = jax.nn.log_softmax(logits, axis=-1)
    if qcfg is not None:
        return logp, new_state
    return logp


def decode_init_cache(L: int, batch: int, emsize: int, nhead: int,
                      nlayers: int):
    """KV cache for incremental decoding: per layer, (B, nhead, L, hd)
    key/value buffers written in place at the step position."""
    hd = emsize // nhead
    z = jnp.zeros((nlayers, batch, nhead, L, hd), jnp.float32)
    return {"k": z, "v": z}


def decode_step(params, tok, pos, cache, nhead: int = 2, qcfg=None,
                qstate=None):
    """One incremental decoding step: (1, B) token at position ``pos``
    -> ((B, vocab) log-probs, updated cache).

    The reference's generation loop re-runs the FULL prefix per token
    (generate.py:60-65) — O(n) matmul rows per step, which makes
    generation MXU-bound and hides any weight-format win.  Incremental
    decoding computes q/k/v for the new position only and attends
    against the cache, so each step is one row per dense — weight-HBM
    -bound, exactly where the 9-bit packed streams pay (the same
    regime as LSTM generation, PERF.md).  Exactness: post-LN
    transformer layers mix positions only through causally-masked
    attention, so the incremental logits equal the full-prefix
    forward's logits at ``pos`` (asserted in
    test_transformer_lm.py::test_decode_step_matches_full_prefix).
    """
    d = params["encoder"]["w"].shape[1]
    nlayers = sum(1 for k in params if k.endswith(".linear1"))
    hd = d // nhead
    L = cache["k"].shape[3]
    B = tok.shape[1]

    def dense(name, x):
        p = params[name]
        if qcfg is not None and name in qcfg:
            y, _ = tr_dense_apply(p, qcfg[name], qstate[name], x, False)
            return y
        return jnp.dot(x, p["w"]) + p["b"]

    pe = _positional_encoding(L, d)
    h = (params["encoder"]["w"][tok] * math.sqrt(d)
         + jax.lax.dynamic_slice_in_dim(pe, pos, 1, 0)[None, 0])  # (1,B,d)
    for i, pre in _layer_names(nlayers):
        proj = params[f"{pre}.self_attn.in_proj"]
        qkv = jnp.dot(h, proj["w"]) + proj["b"]  # (1, B, 3d)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (1, B, d) -> (B, nhead, 1, hd)
            return t.reshape(B, nhead, hd)[:, :, None, :]

        q, k, v = heads(q), heads(k), heads(v)
        ck = jax.lax.dynamic_update_slice(
            cache["k"], k[None], (i, 0, 0, pos, 0))
        cv = jax.lax.dynamic_update_slice(
            cache["v"], v[None], (i, 0, 0, pos, 0))
        cache = {"k": ck, "v": cv}
        scores = jnp.einsum("bhtd,bhsd->bhts", q, ck[i]) / math.sqrt(hd)
        live = jnp.arange(L) <= pos  # causal: cache beyond pos invisible
        scores = jnp.where(live[None, None, None, :], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        a = jnp.einsum("bhts,bhsd->bhtd", attn, cv[i])  # (B, nhead, 1, hd)
        a = a.reshape(1, B, d)
        a = dense(f"{pre}.self_attn.out_proj", a.reshape(B, d)).reshape(
            1, B, d)
        h = _layer_norm(params[f"{pre}.norm1"], h + a)
        f2 = dense(f"{pre}.linear2",
                   jax.nn.relu(dense(f"{pre}.linear1", h.reshape(B, d))))
        h = _layer_norm(params[f"{pre}.norm2"], h + f2.reshape(1, B, d))
    logits = dense("decoder", h.reshape(B, d))
    return jax.nn.log_softmax(logits, axis=-1), cache


def apply_train(params, tokens, rng, nhead: int = 2, dropout: float = 0.2):
    """Train-mode forward with dropout at torch's sites: after the
    positional encoding (PositionalEncoding.forward, model.py:100-106),
    on the attention probabilities, after each sublayer output before
    its residual add, and on the ReLU feed-forward hidden
    (TransformerEncoderLayer's dropout/dropout1/dropout2).  The training
    driver (``tq_tpu.evals.train_lstm --model Transformer``) pairs this
    with the reference's annealed-SGD loop (main.py:139-150,156-227)."""
    d = params["encoder"]["w"].shape[1]
    nlayers = sum(1 for k in params if k.endswith(".linear1"))
    T, B = tokens.shape
    keep = 1.0 - dropout

    def drop(key, x):
        if dropout == 0.0:
            return x
        return x * jax.random.bernoulli(key, keep, x.shape) / keep

    def dense(name, x):
        p = params[name]
        return jnp.dot(x, p["w"]) + p["b"]

    keys = jax.random.split(rng, 5 * nlayers + 1)
    h = params["encoder"]["w"][tokens] * math.sqrt(d)
    h = drop(keys[0], h + _positional_encoding(T, d)[:, None, :])
    for i, pre in _layer_names(nlayers):
        k = keys[1 + 5 * i : 1 + 5 * (i + 1)]
        a = _attention(params, pre, h, nhead, dropout, k[0])
        a = dense(f"{pre}.self_attn.out_proj", a)
        h = _layer_norm(params[f"{pre}.norm1"], h + drop(k[1], a))
        f = drop(k[2], jax.nn.relu(dense(f"{pre}.linear1", h)))
        f = dense(f"{pre}.linear2", f)
        h = _layer_norm(params[f"{pre}.norm2"], h + drop(k[3], f))
    logits = dense("decoder", h.reshape(T * B, d))
    return jax.nn.log_softmax(logits, axis=-1)


def convert(params, wb, gs, wt, db, dt, quantize_input: bool = False):
    """TR-convert every Linear (out_proj, linear1/2 per layer, decoder)."""
    tr = TRParams(wb, gs, wt, db, dt, quantize_input=quantize_input)
    nlayers = sum(1 for k in params if k.endswith(".linear1"))
    names = ["decoder"]
    for i, pre in _layer_names(nlayers):
        names += [f"{pre}.self_attn.out_proj", f"{pre}.linear1", f"{pre}.linear2"]
    qparams = dict(params)
    qcfg, qstate = {}, {}
    for n in names:
        qparams[n] = tr_dense_convert(params[n], tr)
        qcfg[n] = tr
        qstate[n] = init_quant_state()
    return qparams, qcfg, qstate


def pack(qparams, qcfg, fmt: str = "int"):
    """Serving transform: pack every TR-converted linear's weights into
    narrow integers (mirrors ``lstm_lm.pack``).  Autoregressive
    generation re-reads every dense weight each token, so the packed
    formats' smaller HBM footprint applies to the whole stack here —
    the decoder (emsize -> vocab) dominating as in the LSTM.
    ``fmt='u8s'``: the 9-bits/weight format for 8-bit grids."""
    from tq_tpu.kernels.term_matmul import flush_pack_checks
    from tq_tpu.layers.linear import pack_dense_weights

    out = dict(qparams)
    checks: list = []  # ONE host sync for the whole model (congested-
    # tunnel resilience: per-tensor syncs cost minutes, BENCH_r04)
    for name, tr in qcfg.items():
        if fmt == "u8s" and tr.weight_bits > 8:
            # u8s only fits 8-bit grids; fall back to the int format for
            # wider layers in a mixed-precision config (ADVICE r3 #2)
            # instead of raising on the whole model.
            if tr.weight_bits <= 15:
                out[name] = pack_dense_weights(qparams[name], tr, fmt="int",
                                               checks=checks)
        elif fmt == "u8s" or tr.weight_bits <= 15:
            out[name] = pack_dense_weights(qparams[name], tr, fmt=fmt,
                                           checks=checks)
    flush_pack_checks(checks)
    return out


def make_tp_quantized_apply(qcfg, mesh, nhead: int = 2):
    """Serving forward with the 9-bit packed decoder column-parallel
    over the mesh's 'model' axis — the Transformer mirror of the LSTM
    packed-decoder TP (VERDICT r3 next #8).

    Autoregressive generation re-reads the decoder (emsize -> vocab,
    the dominant weight stream) every token; sharding its
    1.125-bytes/weight packed planes over the mesh divides that
    per-token HBM traffic by the mesh size while each device decodes
    its shard in VMEM (:func:`~tq_tpu.parallel.tp.tp_term_matmul_col_packed`).
    The trunk (attention + FFN, tiny next to the vocab matmul at
    generation shapes) stays replicated.  Requires
    ``pack(qparams, qcfg, fmt='u8s')`` params; the decoder's TR config
    drives quantize-vs-raw input exactly as ``tr_dense_apply`` does.
    """
    from tq_tpu.parallel.tp import tp_term_matmul_col_packed

    tr = qcfg["decoder"]

    @jax.jit
    def forward(qparams, qstate, tokens):
        from tq_tpu.kernels.term_matmul import PackedWeight8

        dec = qparams["decoder"]
        if not isinstance(dec["w"], PackedWeight8):
            raise TypeError(
                "make_tp_quantized_apply needs u8s-packed decoder "
                "weights — call pack(qparams, qcfg, fmt='u8s') first")

        def decoder_fn(h2):
            if tr.quantize_input:
                y = tp_term_matmul_col_packed(
                    h2, dec["w"], qstate["decoder"]["sf"],
                    tr.data_bits, tr.data_terms, mesh)
            else:  # raw-input serving (the reference TRLinearLayer path)
                # bf16=False: raw activations are not small integers, so
                # the bf16 MXU would not be exact here (unlike the
                # quantized branch, where magnitudes <= 256 are).
                y = tp_term_matmul_col_packed(
                    h2, dec["w"], jnp.float32(1.0),
                    tr.data_bits, tr.data_terms, mesh, bf16=False,
                    quantize_x=False)
            return y + dec["b"]

        return apply(qparams, tokens, nhead=nhead, qcfg=qcfg,
                     qstate=qstate, track=False, decoder_fn=decoder_fn)

    return forward


def make_quantized_apply(qcfg, track: bool, nhead: int = 2):
    @jax.jit
    def forward(qparams, qstate, tokens):
        return apply(qparams, tokens, nhead=nhead, qcfg=qcfg,
                     qstate=qstate, track=track)

    return forward


def finalize(qstate, qcfg):
    return {
        n: finalize_quant_state(qstate[n], qcfg[n].data_bits,
                                qcfg[n].data_terms)
        for n in qstate
    }
