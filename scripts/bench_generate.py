"""Token-by-token LSTM generation: decoder weight-format A/B.

Single-stream generation (batch 1, one token per step — the
reference's lstm_models/generate.py loop) is weight-HBM-bound: every
step re-reads the 650x33278 decoder projection while doing only
2*650*33278 = 43 MFLOP of MXU work.  This measures tokens/s of the
full quantized forward (embed -> 2-layer LSTM -> TR decoder) with the
decoder stored as:

  fp32      term-revealed fp values (4 B/weight)
  i16       pack_weight_int int16 (2 B/weight)
  u8s       pack_weight_u8s 9-bit pack (1.125 B/weight)
  u8sb      u8s + the unquantized (layer >= 1) recurrent weights cast
            bf16 (same rounding class as this chip's f32 MXU operands)

Since round 4 the packs cover the recurrent weights too
(tr_lstm_pack — they were ~40% of the u8s step's HBM traffic).

The chain is natural: each step's input token is sampled (argmax) from
the previous step's logits and the hidden state threads through, so
steps are data-dependent and dispatch pipelining cannot hide the work.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tq_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tq_tpu.models import lstm_lm

VOCAB, EM, HID, LAYERS = 33278, 650, 650, 2


def build(fmt):
    params = lstm_lm.init(jax.random.PRNGKey(0), vocab=VOCAB, emsize=EM,
                          nhid=HID, nlayers=LAYERS)
    qparams, qcfg, qstate = lstm_lm.convert(params, 8, 8, 24, 8, 8)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    if fmt != "fp32":
        qparams = lstm_lm.pack(
            qparams, qcfg,
            fmt="int" if fmt == "i16" else "u8s",
            rnn=fmt != "u8sd",  # u8sd: round-3 behaviour, decoder only
            rnn_unquantized_dtype=jnp.bfloat16 if fmt == "u8sb" else None)
    fwd = lstm_lm.make_quantized_apply(qcfg, track=False)

    @jax.jit
    def step(qparams, qstate, tok, hidden):
        logp, hidden, _ = fwd(qparams, qstate, tok, hidden)
        nxt = jnp.argmax(logp[-1]).reshape(1, 1).astype(jnp.int32)
        return nxt, hidden

    return qparams, qstate, step


def tokens_per_s(fmt, steps=30):
    qparams, qstate, step = build(fmt)
    hidden0 = lstm_lm.init_hidden(1, nhid=HID, nlayers=LAYERS)
    tok0 = jnp.zeros((1, 1), jnp.int32)

    def run(n):
        tok, hidden = tok0, hidden0
        t0 = time.perf_counter()
        for _ in range(n):
            tok, hidden = step(qparams, qstate, tok, hidden)
        int(tok[0, 0])  # host FETCH — block_until_ready lies on this rig
        return time.perf_counter() - t0

    run(2)  # compile
    t1 = min(run(1) for _ in range(3))
    tn = min(run(steps) for _ in range(3))
    dt = max(tn - t1, 1e-9) / (steps - 1)
    return 1.0 / dt, dt


def main():
    only = sys.argv[1:] or ["fp32", "i16", "u8s", "u8sb"]
    for fmt in only:
        tps, dt = tokens_per_s(fmt)
        print(f"{fmt:5s} {dt * 1e6:9.1f} us/token  {tps:8.1f} tokens/s",
              flush=True)


if __name__ == "__main__":
    main()
