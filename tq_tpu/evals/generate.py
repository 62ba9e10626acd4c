"""Text sampler for the LSTM LM (reference lstm_models/generate.py).

Samples ``--words`` tokens autoregressively from a trained (optionally
TR-converted) model with temperature scaling; writes one word per token,
'<eos>' as newline, 20 words per line like the reference.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tq_tpu.data.wikitext import load_corpus
from tq_tpu.models import lstm_lm


def generate(params, vocab: int, words: int = 100, temperature: float = 1.0,
             seed: int = 1111):
    if temperature < 1e-3:
        raise ValueError("temperature has to be greater or equal 1e-3")
    nhid = params["rnn"][0]["w_hh"].shape[0]
    hidden = lstm_lm.init_hidden(1, nhid=nhid, nlayers=len(params["rnn"]))
    step = jax.jit(lstm_lm.apply)
    rng = np.random.default_rng(seed)
    tok = int(rng.integers(0, vocab))
    out = []
    for _ in range(words):
        logp, hidden = step(params, jnp.asarray([[tok]]), hidden)
        # logp is log-softmax; the reference divides *logits* by T then
        # exponentiates — equivalent up to normalization.
        w = np.exp(np.asarray(logp[0], np.float64) / temperature)
        w /= w.sum()
        tok = int(rng.choice(vocab, p=w))
        out.append(tok)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="pretrained/lstm.npz")
    ap.add_argument("--data", default=None)
    ap.add_argument("--words", type=int, default=100)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--outf", default="generated.txt")
    a = ap.parse_args(argv)

    corpus, source = load_corpus(a.data)
    vocab = len(corpus.dictionary.idx2word)
    from tq_tpu.utils.checkpoint import load_params

    params = load_params(a.checkpoint)
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
