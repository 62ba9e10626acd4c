"""Wikitext-2 LSTM UQ/TR perplexity sweep (equivalent of evaluate_lstm.py).

Protocol per (wb, wt, db, dt, gs) setting (evaluate_lstm.py:154-177):
convert -> full calibration pass over the test stream (the reference
calibrates on the *entire* eval set, not 5%) -> finalize scales ->
evaluate perplexity -> profile.  bptt=35 chunks of a batchified (T, 10)
token stream, hidden state carried across chunks.

tmacs/param_bits reproduce the reference profile exactly: the LSTM hook
is a no-op (profile_model.py:48-49), so cost comes only from the decoder
linear on one bptt chunk — ``35*10*vocab*650`` MACs — and param_bits
count only the decoder weight (g=1: nelement*wb; g>1: compressed HESE).

Output schema: ``{"ppls": [], "tmacs": [], "param_bits": []}``
(results/lstm-{quant,tr}.json).
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tq_tpu.models import lstm_lm
from tq_tpu.profilers import dense_param_bits, dense_term_macs
from tq_tpu.layers.common import TRParams

EVAL_BATCH = 10
BPTT = 35


def _chunks(stream: np.ndarray, bptt: int = BPTT):
    """get_batch over the (T, B) stream (evaluate_lstm.py:135-139)."""
    for i in range(0, len(stream) - 1, bptt):
        seq = min(bptt, len(stream) - 1 - i)
        yield stream[i : i + seq], stream[i + 1 : i + 1 + seq].reshape(-1)


def _run_epoch(fwd, qparams, qstate, stream, vocab, update_state: bool,
               cell: str = "LSTM"):
    """One pass over the stream; returns (mean NLL per token, qstate).

    The full-length chunks run as ONE jitted ``lax.scan`` over the
    (n_chunks, bptt, B) stream: a single dispatch for the whole epoch,
    and — the real win — XLA keeps the scan-loop-invariant weights
    VMEM-resident instead of re-streaming them from HBM per chunk
    (PERF.md "Generation at VMEM residency"; the eval path re-reads the
    650x33278 decoder every chunk otherwise).  The tail chunk (shorter
    than bptt) runs as one extra dispatch; at most 2 programs total.
    """
    total_loss = 0.0
    nhid = qparams["rnn"][0]["w_hh"].shape[0]
    hidden = lstm_lm.init_hidden(EVAL_BATCH, nhid=nhid,
                                 nlayers=len(qparams["rnn"]), cell=cell)
    n_chunks = (len(stream) - 1) // BPTT
    if n_chunks:
        B = stream.shape[1]
        X = jnp.asarray(
            stream[: n_chunks * BPTT].reshape(n_chunks, BPTT, B))
        Y = jnp.asarray(
            stream[1 : n_chunks * BPTT + 1].reshape(n_chunks, BPTT * B))

        @jax.jit
        def epoch(qparams, qstate, hidden, X, Y):
            def step(carry, xy):
                hidden, qstate, tot = carry
                x, y = xy
                logp, hidden, new_qs = fwd(qparams, qstate, x, hidden)
                if update_state:
                    qstate = new_qs
                nll = -jnp.take_along_axis(
                    logp, y[:, None], axis=1).mean()
                return (hidden, qstate, tot + BPTT * nll), None

            (hidden, qstate, tot), _ = jax.lax.scan(
                step, (hidden, qstate, jnp.float32(0.0)), (X, Y))
            return hidden, qstate, tot

        hidden, qstate, tot = epoch(qparams, qstate, hidden, X, Y)
        total_loss += float(tot)
    # Tail chunk (if the stream length - 1 is not a bptt multiple).
    for x, y in _chunks(stream[n_chunks * BPTT :]):
        logp, hidden, new_qs = fwd(
            qparams, qstate, jnp.asarray(x), hidden
        )
        if update_state:
            qstate = new_qs
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(y)[:, None], axis=1
        ).mean()
        total_loss += len(x) * float(nll)
    return total_loss / (len(stream) - 1), qstate


def evaluate_setting(params, wb, wt, db, dt, gs, stream, vocab,
                     quantize_decoder_input=False, quantize_layers=(0,),
                     merge_hack=True, cell: str = "LSTM"):
    qparams, qcfg, qstate = lstm_lm.convert(
        params, wb, gs, wt, db, dt,
        quantize_layers=quantize_layers,
        quantize_decoder_input=quantize_decoder_input,
        cell=cell,
    )
    track_fwd = lstm_lm.make_quantized_apply(qcfg, track=True)
    _, qstate = _run_epoch(track_fwd, qparams, qstate, stream, vocab, True,
                           cell)
    qstate = lstm_lm.finalize(qstate, qcfg)

    eval_fwd = lstm_lm.make_quantized_apply(qcfg, track=False)
    loss, _ = _run_epoch(eval_fwd, qparams, qstate, stream, vocab, False,
                         cell)
    ppl = math.exp(loss)

    tr = TRParams(wb, gs, wt, db, dt)
    nhid = qparams["decoder"]["w"].shape[0]
    tmacs = dense_term_macs(BPTT * EVAL_BATCH * vocab, nhid, tr)
    param_bits = dense_param_bits(
        qparams["decoder"]["w"], qparams["decoder"]["w_sf"], tr,
        merge_hack=merge_hack,
    )
    return ppl, tmacs, param_bits


def evaluate_setting_transformer(params, wb, wt, db, dt, gs, stream, vocab,
                                 bptt: int = BPTT):
    """Transformer-LM sweep point (the reference's --model Transformer
    path, lstm_models/model.py:108-152; its committed evaluate() only
    exercises the LSTM, so this is the working equivalent).

    tmacs counts every converted linear on one bptt chunk (out_proj +
    ffn pair per layer + decoder); param_bits counts the same weights.
    """
    from tq_tpu.models import transformer_lm
    from tq_tpu.profilers import dense_param_bits

    qparams, qcfg, qstate = transformer_lm.convert(params, wb, gs, wt, db, dt)
    track = transformer_lm.make_quantized_apply(qcfg, track=True)
    # Device-side loss accumulator (one host fetch per epoch, not per
    # chunk — ~30 ms RTT each on the tunneled chip).
    total_loss = jnp.float32(0.0)
    for x, y in _chunks(stream, bptt):
        _, qstate = track(qparams, qstate, jnp.asarray(x))
    qstate = transformer_lm.finalize(qstate, qcfg)
    ev = transformer_lm.make_quantized_apply(qcfg, track=False)
    for x, y in _chunks(stream, bptt):
        logp, _ = ev(qparams, qstate, jnp.asarray(x))
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(y)[:, None], axis=1).mean()
        total_loss = total_loss + len(x) * nll
    ppl = math.exp(float(total_loss) / (len(stream) - 1))

    tr = TRParams(wb, gs, wt, db, dt)
    tmacs = 0
    bits = 0
    B = stream.shape[1]
    for name in qcfg:
        w = qparams[name]["w"]
        out_elems = bptt * B * w.shape[1]
        tmacs += dense_term_macs(out_elems, w.shape[0], tr)
        bits += dense_param_bits(w, qparams[name]["w_sf"], tr)
    return ppl, tmacs, bits


def run_sweep(wb, wt, db, dt, gs, out_file=None, checkpoint=None,
              data_dir=None, limit_tokens=None, verbose=True,
              model: str = "LSTM", merge_hack=True):
    from tq_tpu.data.wikitext import batchify, load_corpus

    corpus, source = load_corpus(data_dir)
    vocab = len(corpus.dictionary.idx2word)
    if verbose:
        print(f"corpus source: {source}; vocab={vocab}")

    import jax

    if checkpoint:
        params = _load_checkpoint(checkpoint, vocab)
    elif model == "Transformer":
        from tq_tpu.models import transformer_lm

        params = transformer_lm.init(jax.random.PRNGKey(0), vocab=vocab)
    else:
        params = lstm_lm.init(jax.random.PRNGKey(0), vocab=vocab,
                              cell=model)

    test = corpus.test
    if limit_tokens:
        test = test[:limit_tokens]
    stream = batchify(np.asarray(test), EVAL_BATCH)

    results = {"ppls": [], "tmacs": [], "param_bits": []}
    # Crash resume: skip settings already present in a partial out_file.
    if out_file and Path(out_file).exists():
        prior = json.loads(Path(out_file).read_text())
        if prior.get("ppls"):
            results = prior
    skip = len(results["ppls"])
    for i, setting in enumerate(zip(wb, wt, db, dt, gs)):
        if i < skip:
            continue
        if model == "Transformer":
            ppl, tmacs, bits = evaluate_setting_transformer(
                params, *setting, stream=stream, vocab=vocab
            )
        else:
            ppl, tmacs, bits = evaluate_setting(
                params, *setting, stream=stream, vocab=vocab,
                merge_hack=merge_hack, cell=model,
            )
        results["ppls"].append(ppl)
        results["tmacs"].append(float(tmacs))
        results["param_bits"].append(float(bits))
        if verbose:
            print(*setting, ppl, tmacs, bits, flush=True)
        if out_file:
            Path(out_file).parent.mkdir(parents=True, exist_ok=True)
            with open(out_file, "w") as fp:
                json.dump(results, fp)
    return results


def _load_checkpoint(path, vocab):
    p = Path(path)
    if p.suffix == ".npz":
        from tq_tpu.utils.checkpoint import load_params

        return load_params(p)
    from tq_tpu.utils.torch_import import load_torch_checkpoint

    tree = load_torch_checkpoint(p)
    params = {
        "encoder": {"w": jnp.asarray(tree["encoder"]["w"].T)
                    if tree["encoder"]["w"].shape[0] != vocab
                    else jnp.asarray(tree["encoder"]["w"])},
        "rnn": [
            {k: jnp.asarray(v) for k, v in layer.items()}
            for layer in tree["rnn"]
        ],
        "decoder": {"b": jnp.asarray(tree["decoder"]["b"])},  # tied
    }
    return params


def main(argv=None):
    from tq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="Wikitext-2 LSTM UQ/TR sweep")
    ap.add_argument("--wb", nargs="+", type=int, required=True)
    ap.add_argument("--wt", nargs="+", type=int, required=True)
    ap.add_argument("--db", nargs="+", type=int, required=True)
    ap.add_argument("--dt", nargs="+", type=int, required=True)
    ap.add_argument("--gs", nargs="+", type=int, required=True)
    ap.add_argument("--out-file", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--data", default=None)
    ap.add_argument("--limit-tokens", type=int, default=None)
    ap.add_argument("--model", default="LSTM",
                    choices=["LSTM", "GRU", "RNN_TANH", "RNN_RELU",
                             "Transformer"],
                    help="the reference main.py model families; the "
                         "recurrent cells share the TRLSTMLayer-style "
                         "shared-quantizer protocol")
    ap.add_argument("--sound-hese", action="store_true",
                    help="count param_bits with the sound CSD automaton "
                         "instead of the reference's merging-neighbors hese()")
    a = ap.parse_args(argv)
    run_sweep(a.wb, a.wt, a.db, a.dt, a.gs, a.out_file, a.checkpoint,
              a.data, a.limit_tokens, model=a.model,
              merge_hack=not a.sound_hese)


if __name__ == "__main__":
    main()
