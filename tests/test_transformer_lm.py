"""Transformer LM: torch parity + TR conversion tests."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tq_tpu.models import transformer_lm

# On the real chip (TQ_TEST_TPU=1) fp32 MXU operands round to 8
# mantissa bits (--xla_allow_excess_precision), so cross-implementation
# comparisons (torch f32 / full-vs-incremental groupings / packed-vs-fp
# weights) can only agree to the bf16 operand-rounding class; the CPU
# run pins the tight tolerances.
_MXU_ATOL = 2e-2 if jax.default_backend() == "tpu" else 0.0


def _import_torch(tmodel, vocab, emsize, nhead, nlayers):
    sd = tmodel.state_dict()
    p = {"encoder": {"w": jnp.asarray(sd["encoder.weight"].numpy())}}
    for i in range(nlayers):
        pre = f"transformer_encoder.layers.{i}"
        p[f"{pre}.self_attn.in_proj"] = {
            "w": jnp.asarray(sd[f"{pre}.self_attn.in_proj_weight"].numpy().T),
            "b": jnp.asarray(sd[f"{pre}.self_attn.in_proj_bias"].numpy()),
        }
        p[f"{pre}.self_attn.out_proj"] = {
            "w": jnp.asarray(sd[f"{pre}.self_attn.out_proj.weight"].numpy().T),
            "b": jnp.asarray(sd[f"{pre}.self_attn.out_proj.bias"].numpy()),
        }
        for lin in ("linear1", "linear2"):
            p[f"{pre}.{lin}"] = {
                "w": jnp.asarray(sd[f"{pre}.{lin}.weight"].numpy().T),
                "b": jnp.asarray(sd[f"{pre}.{lin}.bias"].numpy()),
            }
        for nrm in ("norm1", "norm2"):
            p[f"{pre}.{nrm}"] = {
                "scale": jnp.asarray(sd[f"{pre}.{nrm}.weight"].numpy()),
                "bias": jnp.asarray(sd[f"{pre}.{nrm}.bias"].numpy()),
            }
    p["decoder"] = {
        "w": jnp.asarray(sd["decoder.weight"].numpy().T),
        "b": jnp.asarray(sd["decoder.bias"].numpy()),
    }
    return p


class _TorchTwin(nn.Module):
    """The reference TransformerModel (lstm_models/model.py:108-152),
    eval mode (dropout 0)."""

    def __init__(self, ntoken, ninp, nhead, nhid, nlayers):
        super().__init__()
        layer = nn.TransformerEncoderLayer(ninp, nhead, nhid, dropout=0.0)
        self.transformer_encoder = nn.TransformerEncoder(layer, nlayers)
        self.encoder = nn.Embedding(ntoken, ninp)
        self.decoder = nn.Linear(ninp, ntoken)
        self.ninp = ninp

    def forward(self, src):
        T = src.shape[0]
        mask = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
        x = self.encoder(src) * math.sqrt(self.ninp)
        # positional encoding added separately in the jax side too
        pos = np.zeros((T, self.ninp), np.float32)
        position = np.arange(T)[:, None]
        div = np.exp(np.arange(0, self.ninp, 2) * (-math.log(10000.0) / self.ninp))
        pos[:, 0::2] = np.sin(position * div)
        pos[:, 1::2] = np.cos(position * div)
        x = x + torch.from_numpy(pos)[:, None, :]
        out = self.transformer_encoder(x, mask)
        return torch.log_softmax(self.decoder(out), dim=-1)


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    vocab, emsize, nhead, nhid, nlayers = 60, 16, 2, 32, 2
    m = _TorchTwin(vocab, emsize, nhead, nhid, nlayers).eval()
    params = _import_torch(m, vocab, emsize, nhead, nlayers)
    return m, params, vocab


@pytest.mark.slow
def test_forward_matches_torch(twin, rng):
    m, params, vocab = twin
    tokens = rng.integers(0, vocab, size=(7, 3))
    with torch.no_grad():
        ref = m(torch.from_numpy(tokens)).numpy().reshape(7 * 3, vocab)
    out = transformer_lm.apply(params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), ref,
                               atol=max(2e-4, _MXU_ATOL))


@pytest.mark.slow
def test_convert_and_quantized_forward(twin, rng):
    _, params, vocab = twin
    qp, qcfg, qs = transformer_lm.convert(params, 8, 8, 16, 8, 8)
    assert "decoder" in qcfg
    assert "transformer_encoder.layers.0.linear1" in qcfg
    assert "transformer_encoder.layers.0.self_attn.in_proj" not in qcfg
    tokens = jnp.asarray(rng.integers(0, vocab, size=(5, 2)))
    track = transformer_lm.make_quantized_apply(qcfg, track=True)
    _, qs = track(qp, qs, tokens)
    qs = transformer_lm.finalize(qs, qcfg)
    ev = transformer_lm.make_quantized_apply(qcfg, track=False)
    logp, _ = ev(qp, qs, tokens)
    assert logp.shape == (10, vocab)
    assert bool(jnp.all(jnp.isfinite(logp)))


@pytest.mark.slow
def test_high_bit_conversion_near_lossless(twin, rng):
    _, params, vocab = twin
    qp, qcfg, qs = transformer_lm.convert(params, 16, 1, 16, 16, 16,
                                          quantize_input=False)
    tokens = jnp.asarray(rng.integers(0, vocab, size=(6, 2)))
    ref = transformer_lm.apply(params, tokens)
    ev = transformer_lm.make_quantized_apply(qcfg, track=False)
    out, _ = ev(qp, qs, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=max(1e-3, _MXU_ATOL))


def test_generate_transformer_samples_tokens():
    """Fixed-buffer lax.scan sampler (reference generate.py transformer
    branch, generate.py:60-65)."""
    from tq_tpu.evals.generate import generate_transformer

    vocab = 40
    params = transformer_lm.init(
        jax.random.PRNGKey(1), vocab=vocab, emsize=16, nhid=24, nlayers=2)
    toks = generate_transformer(params, vocab, words=10, seed=5)
    assert len(toks) == 10
    assert all(0 <= t < vocab for t in toks)
    # Same seed -> same path (all sampling is on-device PRNG).
    assert toks == generate_transformer(params, vocab, words=10, seed=5)
    with pytest.raises(ValueError):
        generate_transformer(params, vocab, words=2, temperature=1e-4)


def test_generate_fixed_buffer_is_causal():
    """The L-length fixed-buffer forward must give the same next-token
    distribution as an exact (n+1)-length grow-the-prefix forward —
    i.e. garbage beyond the write cursor is invisible under the causal
    mask (the property that makes the one-compile scan sound)."""
    vocab = 25
    params = transformer_lm.init(
        jax.random.PRNGKey(2), vocab=vocab, emsize=16, nhid=24, nlayers=2)
    rng = np.random.default_rng(0)
    prefix = rng.integers(0, vocab, size=5).astype(np.int32)
    L = 9  # fixed buffer longer than the prefix, tail filled with junk
    junk = rng.integers(0, vocab, size=L - 5).astype(np.int32)
    buf = jnp.asarray(np.concatenate([prefix, junk]))[:, None]

    exact = transformer_lm.apply(params, jnp.asarray(prefix)[:, None])
    fixed = transformer_lm.apply(params, buf)
    np.testing.assert_allclose(
        np.asarray(fixed[4]), np.asarray(exact[4]), atol=1e-5)


@pytest.mark.parametrize("fmt", ["int", "u8s"])
def test_pack_transformer_serving(rng, fmt):
    """Packed transformer serving (int16 / 9-bit u8s) matches the
    unpacked quantized forward."""
    vocab = 30
    params = transformer_lm.init(
        jax.random.PRNGKey(3), vocab=vocab, emsize=16, nhid=24, nlayers=2)
    qp, qcfg, qs = transformer_lm.convert(params, 8, 8, 16, 8, 8)
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    tokens = jnp.asarray(rng.integers(0, vocab, size=(5, 2)))
    ev = transformer_lm.make_quantized_apply(qcfg, track=False)
    ref, _ = ev(qp, qs, tokens)
    packed = transformer_lm.pack(qp, qcfg, fmt=fmt)
    out, _ = ev(packed, qs, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_generate_transformer_tr_quantized_sampler():
    """TR-quantized transformer generation (generate_transformer_tr):
    calibrate on a synthetic stream, pack every linear (9-bit u8s),
    sample in one lax.scan — the Transformer mirror of generate_tr."""
    from tq_tpu.data.wikitext import batchify
    from tq_tpu.evals.generate import generate_transformer_tr

    vocab = 30
    params = transformer_lm.init(
        jax.random.PRNGKey(4), vocab=vocab, emsize=16, nhid=24, nlayers=1)
    rng = np.random.default_rng(0)
    stream = batchify(rng.integers(0, vocab, 800).astype(np.int32), 4)
    toks = generate_transformer_tr(
        params, vocab, words=8, seed=3, tr=(8, 8, 24, 8, 8),
        pack_fmt="u8s", calib_stream=stream, calib_chunks=2)
    assert len(toks) == 8 and all(0 <= t < vocab for t in toks)
    # Deterministic: on-device PRNG, same seed -> same path.
    assert toks == generate_transformer_tr(
        params, vocab, words=8, seed=3, tr=(8, 8, 24, 8, 8),
        pack_fmt="u8s", calib_stream=stream, calib_chunks=2)


def test_decode_step_matches_full_prefix():
    """KV-cache incremental decoding == the full-prefix forward at every
    position, fp32 and TR-quantized (the exactness claim that makes the
    weight-HBM-bound serving sampler sound)."""
    vocab, emsize, nhead, nlayers = 30, 16, 2, 2
    params = transformer_lm.init(
        jax.random.PRNGKey(7), vocab=vocab, emsize=emsize, nhead=nhead,
        nhid=24, nlayers=nlayers)
    rng = np.random.default_rng(0)
    T, B = 6, 3
    toks = jnp.asarray(rng.integers(0, vocab, (T, B)), jnp.int32)

    full = transformer_lm.apply(params, toks).reshape(T, B, vocab)
    cache = transformer_lm.decode_init_cache(T, B, emsize, nhead, nlayers)
    for t in range(T):
        logp, cache = transformer_lm.decode_step(
            params, toks[t : t + 1], t, cache, nhead=nhead)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(full[t]),
                                   atol=max(1e-5, _MXU_ATOL),
                                   err_msg=f"pos {t}")

    # Quantized + u8s-packed path agrees with the quantized full forward.
    qp, qcfg, qs = transformer_lm.convert(params, 8, 8, 24, 8, 8)
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    qfull, _ = transformer_lm.make_quantized_apply(qcfg, track=False)(
        qp, qs, toks)
    qfull = qfull.reshape(T, B, vocab)
    qp_packed = transformer_lm.pack(qp, qcfg, fmt="u8s")
    cache = transformer_lm.decode_init_cache(T, B, emsize, nhead, nlayers)
    for t in range(T):
        logp, cache = transformer_lm.decode_step(
            qp_packed, toks[t : t + 1], t, cache, nhead=nhead,
            qcfg=qcfg, qstate=qs)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(qfull[t]),
                                   atol=max(2e-4, _MXU_ATOL),
                                   err_msg=f"q pos {t}")
