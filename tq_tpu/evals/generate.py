"""Text sampler for the LSTM / Transformer LMs (reference
lstm_models/generate.py).

Samples ``--words`` tokens autoregressively from a trained (optionally
TR-converted) model with temperature scaling; writes one word per token,
'<eos>' as newline, 20 words per line like the reference.

The Transformer branch is TPU-idiomatic where the reference grows the
prefix tensor every step (``torch.cat([input, word_tensor])``,
generate.py:65 — a new shape each iteration, which under jit would mean
one recompile per token): here the whole generation runs as ONE jitted
``lax.scan`` over a fixed-length token buffer with static shapes —
single compile, on-device ``jax.random.categorical`` sampling, no
host round-trips inside the loop.  The causal mask makes positions
beyond the write cursor invisible, so the fixed buffer is exact.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tq_tpu.data.wikitext import load_corpus
from tq_tpu.models import lstm_lm


def _sample_loop(step, hidden, vocab: int, words: int, temperature: float,
                 seed: int):
    """The reference's LSTM sampling loop (generate.py:66-70):
    ``step(tok, hidden) -> (logp (1, vocab), hidden)``."""
    if temperature < 1e-3:
        raise ValueError("temperature has to be greater or equal 1e-3")
    rng = np.random.default_rng(seed)
    tok = int(rng.integers(0, vocab))
    out = []
    for _ in range(words):
        logp, hidden = step(jnp.asarray([[tok]]), hidden)
        # logp is log-softmax; the reference divides *logits* by T then
        # exponentiates — equivalent up to normalization.
        w = np.exp(np.asarray(logp[0], np.float64) / temperature)
        w /= w.sum()
        tok = int(rng.choice(vocab, p=w))
        out.append(tok)
    return out


def generate(params, vocab: int, words: int = 100, temperature: float = 1.0,
             seed: int = 1111):
    nhid = params["rnn"][0]["w_hh"].shape[0]
    hidden = lstm_lm.init_hidden(1, nhid=nhid, nlayers=len(params["rnn"]))
    apply = jax.jit(lstm_lm.apply)

    def step(tok, hidden):
        return apply(params, tok, hidden)

    return _sample_loop(step, hidden, vocab, words, temperature, seed)


def generate_tr(params, vocab: int, words: int = 100,
                temperature: float = 1.0, seed: int = 1111,
                tr=(8, 8, 24, 8, 8), pack_fmt: str | None = "u8s",
                calib_stream=None, calib_chunks: int = 4):
    """Generate from the TR-quantized LSTM at serving speed.

    Converts at (wb, gs, wt, db, dt), calibrates the activation scales
    on a few bptt chunks of ``calib_stream`` (a batchified (T, B) token
    stream; the reference calibrates on the eval stream the same way,
    evaluate_lstm.py:163), then samples with the decoder packed for
    weight-HBM-bound token-by-token serving (``pack_fmt``: 'u8s' = the
    9-bits/weight format, 'int' = int8/int16, None = term-revealed
    fp32).
    """
    wb, gs, wt, db, dt = tr
    qparams, qcfg, qstate = lstm_lm.convert(params, wb, gs, wt, db, dt)
    nhid = qparams["rnn"][0]["w_hh"].shape[0]
    nlayers = len(qparams["rnn"])
    if calib_stream is not None:
        from tq_tpu.evals.lstm import _chunks

        track = lstm_lm.make_quantized_apply(qcfg, track=True)
        hidden = lstm_lm.init_hidden(calib_stream.shape[1], nhid=nhid,
                                     nlayers=nlayers)
        for i, (x, _) in enumerate(_chunks(calib_stream)):
            if i >= calib_chunks:
                break
            _, hidden, qstate = track(qparams, qstate, jnp.asarray(x),
                                      hidden)
    qstate = lstm_lm.finalize(qstate, qcfg)
    if pack_fmt is not None:
        qparams = lstm_lm.pack(qparams, qcfg, fmt=pack_fmt)
    fwd = lstm_lm.make_quantized_apply(qcfg, track=False)

    def step(tok, hidden):
        logp, hidden, _ = fwd(qparams, qstate, tok, hidden)
        return logp, hidden

    hidden0 = lstm_lm.init_hidden(1, nhid=nhid, nlayers=nlayers)
    return _sample_loop(step, hidden0, vocab, words, temperature, seed)


def generate_transformer(params, vocab: int, words: int = 100,
                         temperature: float = 1.0, seed: int = 1111,
                         nhead: int = 2):
    """Sample ``words`` tokens from the Transformer LM in one lax.scan.

    Semantics match the reference's transformer branch
    (generate.py:60-65): sample from ``exp(logp[last] / T)``
    (= ``categorical(logits=logp / T)``) and append.  The reference
    passes ``has_mask=False`` there; with a causal mask the *last*
    position attends to exactly the same (full) prefix, so the sampled
    distribution is identical — and the mask is what makes the
    fixed-length buffer sound (garbage beyond the cursor is never
    attended to).
    """
    if temperature < 1e-3:
        raise ValueError("temperature has to be greater or equal 1e-3")
    from tq_tpu.models import transformer_lm

    # Checkpoint loads give host numpy arrays; the scan closes over the
    # params, so they must be device arrays to be traced (the embedding
    # lookup indexes them with a tracer).
    params = jax.tree.map(jnp.asarray, params)
    L = words + 1
    rng = np.random.default_rng(seed)
    buf0 = jnp.zeros((L, 1), jnp.int32).at[0, 0].set(
        int(rng.integers(0, vocab)))

    @jax.jit
    def run(buf, key):
        def step(buf, key_n):
            key, n = key_n
            logp = transformer_lm.apply(params, buf, nhead=nhead)
            logits = jax.lax.dynamic_slice_in_dim(logp, n, 1, 0)[0]
            tok = jax.random.categorical(key, logits / temperature)
            buf = jax.lax.dynamic_update_slice(
                buf, tok.reshape(1, 1).astype(jnp.int32), (n + 1, 0))
            return buf, tok
        keys = jax.random.split(key, words)
        _, toks = jax.lax.scan(step, buf, (keys, jnp.arange(words)))
        return toks

    toks = run(buf0, jax.random.PRNGKey(seed))
    return [int(t) for t in toks]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="pretrained/lstm.npz")
    ap.add_argument("--data", default=None)
    ap.add_argument("--model", default="LSTM",
                    choices=["LSTM", "Transformer"])
    ap.add_argument("--nhead", type=int, default=2)
    ap.add_argument("--words", type=int, default=100)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--outf", default="generated.txt")
    ap.add_argument("--tr", type=int, nargs=5, default=None,
                    metavar=("WB", "GS", "WT", "DB", "DT"),
                    help="generate from the TR-quantized model at this "
                         "setting (LSTM only)")
    ap.add_argument("--pack", default="u8s", choices=["u8s", "int", "none"],
                    help="decoder weight format for --tr serving")
    a = ap.parse_args(argv)

    corpus, source = load_corpus(a.data)
    vocab = len(corpus.dictionary.idx2word)
    from tq_tpu.utils.checkpoint import load_params

    params = load_params(a.checkpoint)
    if a.model == "Transformer":
        if a.tr is not None:
            raise SystemExit("--tr is LSTM-only for now")
        toks = generate_transformer(params, vocab, a.words, a.temperature,
                                    a.seed, nhead=a.nhead)
    elif a.tr is not None:
        from tq_tpu.data.wikitext import batchify
        from tq_tpu.evals.lstm import EVAL_BATCH

        stream = batchify(np.asarray(corpus.test), EVAL_BATCH)
        toks = generate_tr(params, vocab, a.words, a.temperature, a.seed,
                           tr=tuple(a.tr),
                           pack_fmt=None if a.pack == "none" else a.pack,
                           calib_stream=stream)
    else:
        toks = generate(params, vocab, a.words, a.temperature, a.seed)
    with open(a.outf, "w") as f:
        for i, t in enumerate(toks):
            word = (corpus.dictionary.idx2word[t]
                    if source == "real" else str(t))
            f.write(("\n" if word == "<eos>" else word + " "))
            if (i + 1) % 20 == 0:
                f.write("\n")
    print(f"wrote {a.words} words to {a.outf}")


if __name__ == "__main__":
    main()
