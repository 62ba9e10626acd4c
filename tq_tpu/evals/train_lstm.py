"""Wikitext-2 language-model training (reference lstm_models/main.py).

One loop trains every model type the reference's ``--model`` flag
accepts (main.py:13-17, 99-107): LSTM / GRU / RNN_TANH / RNN_RELU via
the recurrent stack, and Transformer.  Faithful recipe: bptt=35
truncated BPTT with hidden-state carry (Transformer: independent
chunks, no carry — main.py:139-150), per-chunk loss on log-probs,
manual SGD ``p -= lr * grad`` with global grad-norm clipping at 0.25,
initial lr 20 annealed by /4 whenever validation loss fails to improve,
best-val checkpoint selection.  Dropout on the embedding and between
recurrent layers (model.py:36-47); the driver default is main.py's
``--dropout`` default 0.2 (model.py's own 0.5 is only the class
default, never used by the training entry point).

TPU-native: one jitted train step per chunk length; the whole chunk's
recurrence runs as a lax.scan.
"""

from __future__ import annotations

import argparse
import functools
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tq_tpu.data.wikitext import batchify, load_corpus
from tq_tpu.models import lstm_lm
from tq_tpu.utils.checkpoint import save_params

RNN_CELLS = ("LSTM", "GRU", "RNN_TANH", "RNN_RELU")
MODELS = RNN_CELLS + ("Transformer",)


def _apply_train(params, tokens, hidden, rng, dropout: float,
                 cell: str = "LSTM"):
    """Recurrent-stack forward with dropout (train mode), mirroring
    RNNModel.forward (model.py:48-54)."""
    emb = params["encoder"]["w"][tokens]
    k1, k2 = jax.random.split(rng)
    keep = 1.0 - dropout
    emb = emb * jax.random.bernoulli(k1, keep, emb.shape) / keep
    from tq_tpu.layers.lstm import _cell_scan

    out = emb
    keys = jax.random.split(k2, len(params["rnn"]))
    if cell == "LSTM":
        (h0, c0), cs = hidden, []
    else:
        h0 = hidden
    hs = []
    for i, layer in enumerate(params["rnn"]):
        if cell == "LSTM":
            out, hT, cT = _cell_scan(layer, out, h0[i], c0[i])
            cs.append(cT)
        else:
            out, hT, _ = _cell_scan(layer, out, h0[i], cell=cell)
        if i < len(params["rnn"]) - 1:
            out = out * jax.random.bernoulli(keys[i], keep, out.shape) / keep
        hs.append(hT)
    out = out * jax.random.bernoulli(keys[-1], keep, out.shape) / keep
    T, B, H = out.shape
    w = lstm_lm._decoder_weight(params)
    logits = jnp.dot(out.reshape(T * B, H), w) + params["decoder"]["b"]
    new_hidden = ((jnp.stack(hs), jnp.stack(cs)) if cell == "LSTM"
                  else jnp.stack(hs))
    return jax.nn.log_softmax(logits, -1), new_hidden


def _sgd_clip_update(params, grads, lr, clip):
    """Global-norm clip (main.py:179, ``--clip`` default 0.25) then
    manual SGD ``p.data.add_(-lr, grad)`` (main.py:180-181)."""
    gnorm = jnp.sqrt(sum(jnp.sum(g * g)
                         for g in jax.tree_util.tree_leaves(grads)))
    scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
    return jax.tree_util.tree_map(
        lambda p, g: (p - lr * scale * g).astype(p.dtype)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params, grads)


@functools.partial(jax.jit, static_argnames=("dropout", "cell"),
                   donate_argnums=(0,))
def _train_step(params, tokens, targets, hidden, rng, lr, clip,
                dropout: float = 0.2, cell: str = "LSTM"):
    def loss_fn(p):
        logp, new_hidden = _apply_train(p, tokens, hidden, rng, dropout,
                                        cell)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=1).mean()
        return nll, new_hidden

    (loss, new_hidden), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return _sgd_clip_update(params, grads, lr, clip), loss, new_hidden


@functools.partial(jax.jit, static_argnames=("dropout", "nhead"),
                   donate_argnums=(0,))
def _train_step_transformer(params, tokens, targets, rng, lr, clip,
                            dropout: float = 0.2, nhead: int = 2):
    from tq_tpu.models import transformer_lm

    def loss_fn(p):
        logp = transformer_lm.apply_train(p, tokens, rng, nhead=nhead,
                                          dropout=dropout)
        return -jnp.take_along_axis(logp, targets[:, None], axis=1).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return _sgd_clip_update(params, grads, lr, clip), loss


def evaluate(params, stream, bptt: int = 35, model: str = "LSTM",
             nhead: int = 2):
    # Device-side loss accumulator: a per-chunk float() would host-sync
    # every chunk (~30 ms RTT each on the tunneled chip).
    total = jnp.float32(0.0)
    if model == "Transformer":
        from tq_tpu.models import transformer_lm

        fwd = jax.jit(functools.partial(transformer_lm.apply, nhead=nhead))
    else:
        nhid = params["rnn"][0]["w_hh"].shape[0]
        hidden = lstm_lm.init_hidden(stream.shape[1], nhid=nhid,
                                     nlayers=len(params["rnn"]), cell=model)
        fwd = jax.jit(functools.partial(lstm_lm.apply, cell=model))
    for i in range(0, len(stream) - 1, bptt):
        seq = min(bptt, len(stream) - 1 - i)
        x = jnp.asarray(stream[i : i + seq])
        y = jnp.asarray(stream[i + 1 : i + 1 + seq].reshape(-1))
        if model == "Transformer":
            logp = fwd(params, x)
        else:
            logp, hidden = fwd(params, x, hidden)
        total = total + seq * -jnp.take_along_axis(
            logp, y[:, None], axis=1).mean()
    return float(total) / (len(stream) - 1)


def train(epochs: int = 40, batch_size: int = 20, bptt: int = 35,
          lr: float = 20.0, dropout: float = 0.2, seed: int = 1111,
          data_dir=None, save_path=None, emsize=650, nhid=650, nlayers=2,
          limit_tokens=None, verbose=True, model: str = "LSTM",
          nhead: int = 2, tied: bool = True, clip: float = 0.25,
          log_interval: int | None = None):
    """``tied``/``clip``/``bptt``/``seed``/``log_interval`` mirror the
    reference CLI (main.py:14-47).  NB the reference's *default* is
    UNTIED (``--tied`` is opt-in, main.py:36-37); this function keeps
    ``tied=True`` for backward compatibility with existing callers and
    the committed demo checkpoint — the CLI below follows the
    reference's untied default."""
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}, got {model!r}")
    corpus, source = load_corpus(data_dir)
    vocab = len(corpus.dictionary.idx2word)
    if verbose:
        print(f"corpus: {source}, vocab={vocab}, model={model}")
    train_toks = np.asarray(corpus.train)
    val_toks = np.asarray(corpus.valid)
    if limit_tokens:
        train_toks = train_toks[:limit_tokens]
        val_toks = val_toks[: max(limit_tokens // 10, 400)]
    train_stream = batchify(train_toks, batch_size)
    val_stream = batchify(val_toks, 10)

    if model == "Transformer":
        from tq_tpu.models import transformer_lm

        params = transformer_lm.init(jax.random.PRNGKey(seed), vocab=vocab,
                                     emsize=emsize, nhead=nhead, nhid=nhid,
                                     nlayers=nlayers)
    else:
        params = lstm_lm.init(jax.random.PRNGKey(seed), vocab=vocab,
                              emsize=emsize, nhid=nhid, nlayers=nlayers,
                              cell=model, tied=tied)
    rng = jax.random.PRNGKey(seed + 1)
    best_val = math.inf
    # Host snapshot from the start: the train step donates its params
    # buffers, so a bare ``best_params = params`` alias would return
    # deleted buffers if epoch 1's val_loss is NaN and the snapshot
    # branch below never runs (ADVICE r4 #3).
    best_params = jax.device_get(params)
    clip_f = jnp.float32(clip)
    for epoch in range(1, epochs + 1):
        if model != "Transformer":
            hidden = lstm_lm.init_hidden(batch_size, nhid=nhid,
                                         nlayers=nlayers, cell=model)
        interval_loss, n_batches = jnp.float32(0.0), 0
        for i in range(0, len(train_stream) - 1, bptt):
            seq = min(bptt, len(train_stream) - 1 - i)
            x = jnp.asarray(train_stream[i : i + seq])
            y = jnp.asarray(train_stream[i + 1 : i + 1 + seq].reshape(-1))
            rng, sub = jax.random.split(rng)
            if model == "Transformer":
                params, loss = _train_step_transformer(
                    params, x, y, sub, jnp.float32(lr), clip_f, dropout,
                    nhead
                )
            else:
                params, loss, hidden = _train_step(
                    params, x, y, hidden, sub, jnp.float32(lr), clip_f,
                    dropout, model
                )
            if log_interval:
                # Accumulate on device; ONE host fetch per interval
                # (the reference prints cur_loss/ppl every
                # --log-interval batches, main.py:186-194).
                interval_loss = interval_loss + loss
                n_batches += 1
                if n_batches % log_interval == 0:
                    cur = float(interval_loss) / log_interval
                    print(f"| epoch {epoch} | batch {n_batches} | "
                          f"lr {lr:.2f} | loss {cur:5.2f} | "
                          f"ppl {math.exp(min(cur, 700)):8.2f}")
                    interval_loss = jnp.float32(0.0)
        val_loss = evaluate(params, val_stream, bptt, model, nhead)
        if verbose:
            print(f"epoch {epoch}: val_loss={val_loss:.3f} "
                  f"ppl={math.exp(min(val_loss, 700)):.2f} lr={lr}")
        if val_loss < best_val:
            best_val = val_loss
            # Host snapshot (donation — see best_params init above).
            best_params = jax.device_get(params)
            if save_path:
                # Record the model family: gate shapes can't tell
                # RNN_TANH from RNN_RELU at load time (ADVICE r4 #1).
                save_params(save_path, params, meta={"model": model})
        else:
            lr /= 4.0  # main.py:227 annealing
    return best_params, best_val


def main(argv=None):
    from tq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LSTM", choices=list(MODELS),
                    help="reference main.py --model: recurrent cell "
                         "type or Transformer")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=20)
    ap.add_argument("--bptt", type=int, default=35,
                    help="sequence length (main.py:30)")
    ap.add_argument("--lr", type=float, default=20.0)
    ap.add_argument("--clip", type=float, default=0.25,
                    help="gradient clipping (main.py:26)")
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--tied", action="store_true",
                    help="tie the word embedding and softmax weights "
                         "(main.py:36-37; like the reference, the "
                         "DEFAULT is untied)")
    ap.add_argument("--seed", type=int, default=1111,
                    help="random seed (main.py:38)")
    ap.add_argument("--log-interval", type=int, default=200,
                    help="report interval in batches (main.py:42); "
                         "0 disables per-batch logging")
    ap.add_argument("--nhead", type=int, default=2)
    ap.add_argument("--data", default=None)
    ap.add_argument("--save", default="pretrained/lstm.npz")
    ap.add_argument("--emsize", type=int, default=650)
    ap.add_argument("--nhid", type=int, default=650)
    ap.add_argument("--nlayers", type=int, default=2)
    ap.add_argument("--limit-tokens", type=int, default=None)
    ap.add_argument("--export", default=None, metavar="PATH",
                    help="after training, serialize the best model's "
                         "serving step to StableHLO at PATH (the "
                         "reference's --onnx-export, main.py:196-202; "
                         "recurrent families only — for the QUANTIZED "
                         "artifact use tq-generate --tr --export)")
    a = ap.parse_args(argv)
    Path(a.save).parent.mkdir(parents=True, exist_ok=True)
    if a.export and a.model == "Transformer":
        ap.error("--export supports the recurrent families here; "
                 "export the Transformer via tq-generate --tr --export")
    best_params, _ = train(
        a.epochs, a.batch_size, bptt=a.bptt, lr=a.lr, dropout=a.dropout,
        seed=a.seed, data_dir=a.data, save_path=a.save, emsize=a.emsize,
        nhid=a.nhid, nlayers=a.nlayers, limit_tokens=a.limit_tokens,
        model=a.model, nhead=a.nhead, tied=a.tied, clip=a.clip,
        log_interval=a.log_interval or None)
    if a.export:
        # The reference exports the TRAINED fp32 model as the
        # deployable graph (main.py:196-202, one (1, batch) step).
        import jax.numpy as jnp

        from tq_tpu.utils.export import export_serving

        params = jax.tree.map(jnp.asarray, best_params)

        def step(tok, hidden):
            return lstm_lm.apply(params, tok, hidden, a.model)

        export_serving(
            step,
            (jnp.zeros((1, 1), jnp.int32),
             lstm_lm.init_hidden(1, nhid=a.nhid, nlayers=a.nlayers,
                                 cell=a.model)),
            a.export)
        print(f"exported serving step to {a.export}")


if __name__ == "__main__":
    main()
