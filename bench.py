"""Headline benchmarks on one chip.  Default run prints the FULL suite —
one JSON line per metric (schema: metric/value/unit/vs_baseline) — so the
driver-captured record carries every headline number, not just one:

  resnet18_tr_inference_int8_bf16io  7-bit full-truncation TR int8
                          serving imgs/s (vs fp32) — the TR-beats-fp32
                          headline row
  resnet18_uq_inference_int8_bf16io  7-bit UQ int8-serving imgs/s (vs fp32)
  resnet18_tr_inference_bf16io  9-bit TR fidelity mode imgs/s (vs fp32)
  lstm_tr_tokens_per_s    quantized wikitext LSTM eval tokens/s (vs fp32)
  lstm_generate_tokens_per_s  one-scan TR sampler tokens/s (vs fp32 scan
                          AND vs the reference's dispatch-per-token algo)
  transformer_generate_tokens_per_s  KV-cache incremental decode (vs the
                          reference's full-prefix algorithm AND the fp32
                          scan of the same KV-cache loop)
  term_matmul_fused       fused quantize+matmul bf16 TFLOP/s (vs unfused)
  term_matmul_int8        int8xint8->int32 MXU TFLOP/s (vs unfused bf16)
  tr_quantize_bandwidth   fused TR quantize kernel GB/s (vs unfused XLA)

Resilience (VERDICT r2 missing #1): the full suite runs each metric in
its OWN subprocess (isolation from hard crashes AND from same-process
device-state pollution, which measured up to 2x on the later metrics);
inside each, backend init is retried with backoff and degrades to CPU
(tagged ``"backend": "cpu"``), and a failure prints
``{"metric": ..., "error": ...}`` instead of killing the suite.  The
suite always exits 0 with one line per metric.

Budgeting (VERDICT r3 next #1, r4 next #1): the suite runs END-TO-END
metrics FIRST (they are the headline evidence) and keeps a global
wall-clock budget (env ``TQ_BENCH_BUDGET_S``, default 1200 s).  Each
metric's subprocess timeout is its WEIGHTED SHARE of the remaining
budget (see ``_run_suite``) — never a flat cap that lets one stuck
metric eat half the record; a metric that can't fit emits
``{"metric": ..., "skipped": "budget", ...}`` instead of being killed
mid-metric, and any timeout flips fast mode for the rest.  Leftover
budget is spent cycling fast-mode RETRIES of failed metrics, so a
retried metric can emit a second line tagged ``"retry": true`` — the
stdout contract is therefore "the LAST line per metric wins" (a retry
value supersedes the earlier error line).  Every line carries ``secs``
(the metric's own
wall-clock, which doubles as a compile-cache health check: a warm
/tmp/tq_jax_cache run takes seconds-to-tens per metric, a cold one
~100 s+ per distinct program on this rig's remote-compile tunnel; the
cache-entry delta is logged per metric on stderr).

The reference has no wall-clock numbers (its CUDA kernel is a fidelity
simulator, SURVEY.md §6); each ``vs_baseline`` is against the honest
unquantized / unfused XLA equivalent of the same computation.

Subcommands run a single bench: ``bench.py quantize|matmul|resnet``
(``matmul int8``, ``resnet int8 uq`` select variants).

Timing methodology: on this rig device completion signals are
acknowledged at enqueue (block_until_ready returns early over the device
tunnel), so wall-clock around dispatch is meaningless.  Instead the op
runs as a data-dependent chain of one compiled program ending in a
scalar fetch; per-iteration time is the slope between 1 and N chained
calls, which cancels dispatch/transfer latency.  (Sanity anchor: the
same harness measures an 8192^3 bf16 matmul at ~186 TFLOP/s on v5e —
94% of peak — where naive block_until_ready timing reports an impossible
34 PFLOP/s.)  Run-to-run spread on a shared chip is real: the quantize
bandwidth line therefore reports the median AND min/max over 5
independent chains (PERF.md "variance" section).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp

# Persistent compilation cache: the suite runs each metric in its own
# subprocess (see SUITE), and first compiles over this rig's remote-
# compile tunnel cost ~100 s each — the cache makes every re-compile
# (across subprocesses AND across driver runs) a disk hit.
jax.config.update("jax_compilation_cache_dir", "/tmp/tq_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np


import os as _os

# Congestion fast mode (set by _run_suite when the first metric runs
# pathologically slow): shorter chains / fewer reps everywhere — the
# values get noisier, but every metric fits the budget.
_FAST = _os.environ.get("TQ_BENCH_FAST") == "1"


def _fast_iters(n: int, lo: int = 12) -> int:
    return max(lo, n // 3) if _FAST else n


def _slope_time(step_fn, x, iters=100):
    """Per-iteration seconds of ``step_fn(x, sf)`` chained on device.

    The chain runs as ``iters`` dispatches of ONE compiled program (not
    a lax.scan — remote compile of long unrolled/scanned kernels is
    prohibitively slow on this rig), data-dependent through x, ending in
    a scalar fetch that forces completion.  Per-iteration slope between
    1 and ``iters`` chained calls cancels dispatch/transfer latency.
    Slightly varying scale factors defeat result memoization and keep
    the chain off fixed points.
    """
    iters = _fast_iters(iters)
    reps = 2 if _FAST else 3
    total = jax.jit(jnp.sum)
    sfs = [jnp.float32(0.02 * (1.0 + 1e-4 * i)) for i in range(iters)]

    def timed(n):
        t0 = time.perf_counter()
        c = x
        for i in range(n):
            c = step_fn(c, sfs[i])
        float(total(c))  # fetch forces true completion
        return time.perf_counter() - t0

    timed(1)  # compile
    t1 = min(timed(1) for _ in range(reps))
    tn = min(timed(iters) for _ in range(reps))
    return max(tn - t1, 1e-9) / (iters - 1)


def _slope_time_scalar(step_fn, x, iters=64):
    """Per-iteration seconds of a step chained through a *scalar*.

    For ops whose natural output shape differs from the input (matmul),
    chaining through the full input tensor would add a (M, K) tensor
    rebuild to every link — more HBM traffic than the kernel itself.
    Instead each link perturbs the scale factor by the previous output's
    mean: sf_i = f(mean(y_{i-1})).  That serializes execution on device
    while adding only an (M, N) reduction per link.
    """

    iters = _fast_iters(iters)
    reps = 2 if _FAST else 3

    @jax.jit
    def link(x, s):
        return jnp.mean(step_fn(x, jnp.float32(0.02) * (1.0 + 1e-6 * s)))

    def timed(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = link(x, s)
        float(s)
        return time.perf_counter() - t0

    timed(2)  # compile + warm
    t1 = min(timed(1) for _ in range(reps))
    tn = min(timed(iters) for _ in range(reps))
    return max(tn - t1, 1e-9) / (iters - 1)


def _copy_ceiling(x, iters: int = 200) -> float:
    """Same-run HBM roofline: GB/s of a Pallas scale-copy over ``x``
    (identical grid/BlockSpec tiling class as the quantize kernel; an
    XLA-fused elementwise copy measures ~40% lower and is NOT a valid
    ceiling proxy — PERF.md).  Every HBM-bound metric line carries this
    so cross-session HBM-state swings (e.g. int8 matmul 203 -> 81 TF
    between rounds) are readable from the JSON alone (VERDICT r3 next
    #3)."""
    from tq_tpu.kernels.tr_quantize import tr_scale_copy

    on_tpu = jax.default_backend() == "tpu"
    t = _slope_time(lambda c, sf: tr_scale_copy(c, sf, interpret=not on_tpu),
                    x, iters=iters)
    return x.size * x.dtype.itemsize * 2 / t / 1e9


def bench_quantize(chains: int | None = None) -> dict:
    """Fused tr_quantize bandwidth; median + min/max over ``chains``
    independent slope measurements (run-to-run spread on a shared chip
    is the dominant noise source — VERDICT r1 weak #1)."""
    from tq_tpu.kernels.tr_quantize import tr_quantize
    from tq_tpu.ops.term_reveal import term_reveal

    if chains is None:
        chains = 2 if _FAST else 3
    on_tpu = jax.default_backend() == "tpu"
    # ResNet-18-scale activation tensor: batch 64 of stage-2 feature maps.
    shape = (64, 56, 56, 64)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    bits, terms = 9, 3

    # 200 chained iterations: fully amortizes the residual per-dispatch
    # overhead (at 100 the kernel reads ~45% under its true bandwidth).
    ts = [
        _slope_time(
            lambda c, sf: tr_quantize(c, sf, bits, 1, terms,
                                      interpret=not on_tpu),
            x, iters=200,
        )
        for _ in range(chains)
    ]
    t_plain = _slope_time(lambda c, sf: term_reveal(c, sf, bits, 1, terms), x)
    # Same-session copy ceiling (see _copy_ceiling).  Absolute GB/s
    # swings with chip/tunnel state ACROSS sessions (176-324 observed);
    # within a session the spread is ~2%, so "at the ceiling" is only
    # meaningful against a ceiling measured in the same run — reported
    # as `copy_ceiling` / `pct_ceiling`.
    ceiling = _copy_ceiling(x)

    nbytes = x.size * 4 * 2  # one read + one write
    gbs = sorted(nbytes / t / 1e9 for t in ts)
    med = gbs[len(gbs) // 2]
    return {
        "metric": "tr_quantize_bandwidth",
        "value": round(med, 2),
        "unit": "GB/s",
        "vs_baseline": round(t_plain * med * 1e9 / nbytes, 3),
        "min": round(gbs[0], 2),
        "max": round(gbs[-1], 2),
        "chains": chains,
        "copy_ceiling": round(ceiling, 2),
        "pct_ceiling": round(100 * med / ceiling, 1),
    }


def bench_matmul(int8: bool = False) -> dict:
    """Fused quantize+matmul vs the unfused tr_quantize -> XLA matmul
    composition (both bf16 MXU operands — exact for 8-bit quantization
    grids), at a bandwidth-leaning shape where fusion's saved HBM
    round-trip of the quantized activations shows.  ``int8``: the true
    integer serving path (int8 x int8 -> int32 MXU, exact for <= 7-bit
    settings)."""
    from tq_tpu.kernels.term_matmul import term_matmul
    from tq_tpu.kernels.tr_quantize import tr_quantize

    on_tpu = jax.default_backend() == "tpu"
    M, K, N = 8192, 2048, 512
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(K, N)), jnp.float32)
    wb = w.astype(jnp.bfloat16)

    if int8:
        from tq_tpu.kernels.term_matmul import pack_weight_int
        from tq_tpu.ops.term_reveal import term_reveal

        bits, terms = 7, 3
        w_sf = jnp.max(jnp.abs(w)) / 2 ** (7 - 1)
        w_tr = term_reveal(w.T, w_sf, 7, 8, 12).T
        w_i8, w_sf8 = pack_weight_int(w_tr, w_sf, 7)

        def fused(c, sf):
            return term_matmul(c, w_i8, sf, bits, terms, int8=True,
                               w_sf=w_sf8, interpret=not on_tpu)

        def unfused(c, sf):
            xq = tr_quantize(c, sf, bits, 1, terms, interpret=not on_tpu)
            return jnp.dot(xq.astype(jnp.bfloat16),
                           w_tr.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        t_f = _slope_time_scalar(fused, x)
        t_u = _slope_time_scalar(unfused, x)
        # The int8 path is HBM-roofline-bound (PERF.md session-state
        # caveat: 203 -> 81 TF across rounds was HBM state, not the
        # kernel) — carry the same-run ceiling so the JSON is readable
        # alone.  stream_gbs: the kernel's actual per-link HBM traffic
        # (x f32 read + int8 weight read + f32 output write) over t_f.
        ceiling = _copy_ceiling(x)
        stream = (M * K * 4 + K * N * 1 + M * N * 4) / t_f / 1e9
        return {
            "metric": "term_matmul_int8",
            "value": round(2 * M * K * N / t_f / 1e12, 3),
            "unit": "TFLOP/s",
            "vs_baseline": round(t_u / t_f, 3),
            "stream_gbs": round(stream, 1),
            "copy_ceiling": round(ceiling, 1),
            "pct_ceiling": round(100 * stream / ceiling, 1),
        }

    bits, terms = 8, 3

    def fused(c, sf):
        return term_matmul(c, w, sf, bits, terms, bf16=True,
                           interpret=not on_tpu)

    def unfused(c, sf):
        xq = tr_quantize(c, sf, bits, 1, terms, interpret=not on_tpu)
        return jnp.dot(xq.astype(jnp.bfloat16), wb,
                       preferred_element_type=jnp.float32)

    t_f = _slope_time_scalar(fused, x)
    t_u = _slope_time_scalar(unfused, x)
    return {
        "metric": "term_matmul_fused",
        "value": round(2 * M * K * N / t_f / 1e12, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(t_u / t_f, 3),
    }


def bench_resnet(int8: bool = False, uq: bool = False,
                 bf16: bool = False) -> dict:
    """End-to-end quantized ResNet-18 inference throughput (imgs/s) on
    one chip, vs the fp32 forward as baseline.

    Variants: default = the reference's 9-bit TR headline setting
    (wb=9, g=8, wt=12, dt=3) with f32 tensors (the parity structure);
    ``bf16`` = the same setting in the bf16-IO serving mode (every
    inter-layer tensor at 2 bytes — the model is activation-bandwidth
    bound, PERF.md roofline); ``int8 uq`` = 7-bit UQ weights+data with
    int8-packed weights and integer MXU convs (true-integer serving;
    combine with ``bf16`` for bf16 elementwise IO around them)."""
    import jax.random as jrandom

    from tq_tpu.convert import convert_cnn, pack_cnn, \
        static_conv_layer_settings
    from tq_tpu.convert.cnn import make_cnn_apply
    from tq_tpu.models import resnet

    wb, db = (7, 7) if int8 else (9, 9)
    gs, wt, dt = (1, 7, 5) if uq else (8, 12, 3)

    params = resnet.init(jrandom.PRNGKey(0))
    specs = resnet.conv_specs()
    settings = static_conv_layer_settings(specs, wb, gs, wt)
    qparams, qcfg, qstate = convert_cnn(resnet, params, settings, db, dt)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    if int8:
        qparams = pack_cnn(qparams, qcfg)
    fwd = make_cnn_apply(resnet, qcfg, track=False,
                         compute_dtype=jnp.bfloat16 if bf16 else None)
    fp32 = jax.jit(lambda x: resnet.apply(params, x))

    batch = 64
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 3)),
        jnp.float32,
    )

    def q_step(c, sf):
        logits, _ = fwd(qparams, qstate, c * (1.0 + 0.0 * sf))
        # fold logits back into the chained image batch (data dependency)
        return c + 1e-9 * jnp.mean(logits)

    def f_step(c, sf):
        return c + 1e-9 * jnp.mean(fp32(c * (1.0 + 0.0 * sf)))

    t_q = _slope_time(q_step, x, iters=50)
    t_f = _slope_time(f_step, x, iters=50)
    return {
        "metric": "resnet18_" + ("uq" if uq else "tr") + "_inference"
        + ("_int8" if int8 else "") + ("_bf16io" if bf16 else ""),
        "value": round(batch / t_q, 1),
        "unit": "imgs/s",
        "vs_baseline": round(t_f / t_q, 3),
    }


def bench_lstm() -> dict:
    """``bench.py lstm``: quantized wikitext LSTM-LM eval throughput
    (tokens/s) vs the fp32 forward, at the published TR sweep's top
    setting (wb=8, g=8, wt=24, db=dt=8) with real input quantization
    (`quantize_decoder_input=True`, the fixed TRLinearLayer behaviour).
    The int16-packed decoder takes tr_dense_apply's wide-N path:
    integer-exact bf16 operands into XLA's matmul (the 650 -> 33278
    projection is output-traffic-bound; scripts/bench_lstm_decoder.py
    has the A/B table vs the fused kernel).

    The chain carries the recurrent ``hidden`` state, so data dependence
    is intrinsic (no scale-perturbation trick needed)."""
    import jax.random as jrandom

    from tq_tpu.models import lstm_lm

    bptt, batch = 35, 64
    params = lstm_lm.init(jrandom.PRNGKey(0))
    qparams, qcfg, qstate = lstm_lm.convert(
        params, 8, 8, 24, 8, 8, quantize_decoder_input=True)
    qparams = lstm_lm.pack(qparams, qcfg)  # int16 decoder -> bf16 MXU path
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    fwd = lstm_lm.make_quantized_apply(qcfg, track=False)
    fp32 = jax.jit(lstm_lm.apply)

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, lstm_lm.VOCAB, (bptt, batch)),
        jnp.int32,
    )
    h0 = lstm_lm.init_hidden(batch)

    def timed(step, n):
        h = h0
        t0 = time.perf_counter()
        for _ in range(n):
            h = step(h)
        float(jnp.sum(h[0][0]))
        return time.perf_counter() - t0

    def q_step(h):
        _, h, _ = fwd(qparams, qstate, tokens, h)
        return h

    def f_step(h):
        _, h = fp32(params, tokens, h)
        return h

    iters = _fast_iters(30, lo=10)
    for step in (q_step, f_step):
        timed(step, 1)  # compile
    t_q = (min(timed(q_step, iters) for _ in range(3))
           - min(timed(q_step, 1) for _ in range(3))) / (iters - 1)
    t_f = (min(timed(f_step, iters) for _ in range(3))
           - min(timed(f_step, 1) for _ in range(3))) / (iters - 1)

    # Epoch-scan mode (round 4): the sweep driver now runs all full
    # chunks as ONE lax.scan (`evals/lstm.py::_run_epoch`), which lets
    # XLA keep the weights VMEM-resident across chunks instead of
    # re-streaming them per dispatch.  Chained-scan slope timing
    # (`_chain_rate` rationale); at ~0.5 ms/chunk the chain sizes below
    # put ~50-150 ms of device time between the two slope points, well
    # above the tunnel RTT jitter.
    n_chunks = 32

    X = jnp.asarray(
        np.random.default_rng(1).integers(
            0, lstm_lm.VOCAB, (n_chunks, bptt, batch)), jnp.int32)

    def scan_rate(quantized):
        # The epoch computes the per-chunk NLL like the real sweep
        # (`evals/lstm.py::_run_epoch`): logp must be CONSUMED — inside
        # jit an unused logp lets XLA dead-code-eliminate the decoder
        # matmul and the "eval" number silently drops the decoder.
        @jax.jit
        def epoch(p, qs, h, tot, X):
            def step(carry, x):
                h, tot = carry
                if quantized:
                    logp, h, _ = fwd(p, qs, x, h)
                else:
                    logp, h = lstm_lm.apply(p, x, h)
                # The sweep's actual statistic: gather the target
                # column per row (next token = the stream shifted by
                # one; row-rolled here as a stand-in with identical
                # cost).  A full reduction like mean(logp) would
                # instead force materializing the (bptt*B, vocab)
                # log-probs — 298 MB/chunk — which the fused
                # gather+logsumexp never writes out.
                y = x.reshape(-1)
                nll = -jnp.take_along_axis(logp, y[:, None], axis=1)
                tot = tot + jnp.mean(nll) * x.size
                return (h, tot), ()

            (h, tot), _ = jax.lax.scan(step, (h, tot), X)
            return h, tot

        p = qparams if quantized else params

        def chain(k):
            h, tot = h0, jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(k):
                h, tot = epoch(p, qstate, h, tot, X)
            float(tot)
            return time.perf_counter() - t0

        chain(1)  # compile
        ka, kb, reps = (2, 5, 2) if _FAST else (3, 9, 3)
        tk1 = min(chain(ka) for _ in range(reps))
        tk2 = min(chain(kb) for _ in range(reps))
        return max(tk2 - tk1, 1e-9) / ((kb - ka) * n_chunks)

    t_scan = scan_rate(True)
    t_scan_f = scan_rate(False)
    # value stays the per-dispatch mode (continuity with earlier
    # rounds); the sweep driver's epoch-scan mode lands within session
    # noise of it on DEVICE time (the eval is bound by the (bptt*B,
    # vocab) output tensor, not the weight streams, so VMEM residency
    # buys little here) but removes the per-chunk host sync — on this
    # rig's ~30 ms RTT that is the real sweep-wall-clock win.
    return {
        "metric": "lstm_tr_tokens_per_s",
        "value": round(bptt * batch / max(t_q, 1e-9), 1),
        "unit": "tokens/s",
        "vs_baseline": round(t_f / max(t_q, 1e-9), 3),
        "epoch_scan": round(bptt * batch / max(t_scan, 1e-9), 1),
        "epoch_scan_vs_fp32": round(t_scan_f / max(t_scan, 1e-9), 3),
    }


def _chain_rate(runner, words: int, k1: int = 6, k2: int = 12,
                reps: int = 3):
    """Marginal seconds/token of a compiled ``runner(tok) -> tok``
    words-token scan: slope between k1 and k2 dependent chained
    dispatches (the carried token links them).  Both points must be
    device-bound — per-chunk device time well above the tunnel's fetch
    RTT — so RTT, dispatch, and one-time loads cancel.  k1*device must
    exceed RTT; at < ~100 us/token and words=288 that holds from k1=6
    (device >= ~35 ms)."""
    if _FAST:
        k1, k2, reps = max(2, k1 // 2), max(3, k2 // 2), 2

    def chain(k):
        tok = jnp.zeros((1, 1), jnp.int32)
        t0 = time.perf_counter()
        for _ in range(k):
            tok = runner(tok)
        int(tok[0, 0])  # host fetch forces completion
        return time.perf_counter() - t0

    chain(1)  # compile
    t1 = min(chain(k1) for _ in range(reps))
    t2 = min(chain(k2) for _ in range(reps))
    return max(t2 - t1, 1e-9) / ((k2 - k1) * words)


def bench_generate() -> dict:
    """``bench.py generate``: token-by-token LSTM generation (batch 1,
    the reference's lstm_models/generate.py loop).

    Primary number (round 4): the TR-quantized sampler as ONE jitted
    lax.scan.  XLA keeps scan-loop-invariant weights resident in VMEM,
    so the per-token marginal cost is compute only — measured ~7x the
    round-3 dispatch-per-token packed mode at this model size (PERF.md
    "Generation at VMEM residency").  value = marginal tokens/s: slope
    between 6 and 12 chained 288-token scans (each chain dependent
    through the carried token) — both points are device-bound, so the
    tunnel RTT, dispatch, and the one-time VMEM weight load cancel
    (slope-by-LENGTH fails here: a short scan's device time hides
    entirely under the ~30 ms fetch RTT).  vs_baseline = the fp32 scan
    sampler of the same loop with the tied decoder materialized
    (apples-to-apples: the quantized model's decoder is materialized
    by convert; the tied transpose would otherwise cost the fp32 side
    its VMEM pinning).

    Secondary fields: ``batch64_tokens_per_s`` is the same scan sampler
    at batch 64 (throughput serving — per-step weight cost is already
    zero, so tokens/s scales with batch until the decoder fills the
    MXU); ``dispatch_u8s`` keeps the round-3 dispatch-per-token packed
    mode measurable (roofline fields against the same-run copy
    ceiling) — the regime that matters when weights exceed VMEM or
    tokens are served one dispatch at a time."""
    from tq_tpu.models import lstm_lm

    params = lstm_lm.init(jax.random.PRNGKey(0))
    # Materialize the tied decoder so the fp32 baseline doesn't carry
    # an in-scan transpose of the embedding the quantized model lacks.
    params = dict(params)
    params["decoder"] = {"w": lstm_lm._decoder_weight(params) * 1.0,
                         "b": params["decoder"]["b"]}
    qparams, qcfg, qstate = lstm_lm.convert(params, 8, 8, 24, 8, 8)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    qp_u8s = lstm_lm.pack(qparams, qcfg, fmt="u8s")
    fwd_q = lstm_lm.make_quantized_apply(qcfg, track=False)
    h0 = lstm_lm.init_hidden(1)
    tok0 = jnp.zeros((1, 1), jnp.int32)
    WORDS = 288

    # --- one-scan samplers (VMEM-resident weights) ---
    def make_scan(quantized):
        @jax.jit
        def run(p, qs, tok0):
            def step(carry, _):
                tok, hidden = carry
                if quantized:
                    logp, hidden, _ = fwd_q(p, qs, tok, hidden)
                else:
                    logp, hidden = lstm_lm.apply(p, tok, hidden)
                tok = jnp.argmax(logp[-1]).reshape(1, 1).astype(jnp.int32)
                return (tok, hidden), tok[0, 0]

            (tok, _), _ = jax.lax.scan(step, (tok0, h0), None,
                                       length=WORDS)
            return tok

        p = qparams if quantized else params
        return lambda tok: run(p, qstate, tok)

    def scan_rate(quantized):
        return _chain_rate(make_scan(quantized), WORDS)

    t_scan_q = scan_rate(True)
    t_scan_f = scan_rate(False)

    # Throughput serving: the same one-scan sampler at batch 64 — the
    # per-step weight cost is already zero (VMEM-resident), so tokens/s
    # scales with batch until the decoder matmul fills the MXU.
    BATCH = 64
    h0_b = lstm_lm.init_hidden(BATCH)

    @jax.jit
    def run_b(p, qs, tok0):
        def step(carry, _):
            tok, hidden = carry
            logp, hidden, _ = fwd_q(p, qs, tok, hidden)
            tok = jnp.argmax(logp.reshape(1, BATCH, -1)[-1], -1)[
                None, :].astype(jnp.int32)
            return (tok, hidden), ()

        (tok, _), _ = jax.lax.scan(step, (tok0, h0_b), None, length=WORDS)
        return tok

    def chain_b(k):
        tok = jnp.zeros((1, BATCH), jnp.int32)
        t0 = time.perf_counter()
        for _ in range(k):
            tok = run_b(qparams, qstate, tok)
        int(tok[0, 0])
        return time.perf_counter() - t0

    chain_b(1)  # compile
    reps_b = 2 if _FAST else 3
    tb1 = min(chain_b(2) for _ in range(reps_b))
    tb2 = min(chain_b(4) for _ in range(reps_b))
    t_scan_b = max(tb2 - tb1, 1e-9) / (2 * WORDS)

    # --- round-3 mode: dispatch per token, packed streams ---
    def build_step(p):
        @jax.jit
        def step(p, qs, tok, hidden):
            logp, hidden, _ = fwd_q(p, qs, tok, hidden)
            nxt = jnp.argmax(logp[-1]).reshape(1, 1).astype(jnp.int32)
            return nxt, hidden

        return lambda tok, hidden: step(p, qstate, tok, hidden)

    def per_token(step, iters=None):
        iters = iters or _fast_iters(30, lo=10)
        def run(n):
            tok, hidden = tok0, h0
            t0 = time.perf_counter()
            for _ in range(n):
                tok, hidden = step(tok, hidden)
            int(tok[0, 0])  # host fetch
            return time.perf_counter() - t0

        run(2)
        t1 = min(run(1) for _ in range(3))
        tn = min(run(iters) for _ in range(3))
        return max(tn - t1, 1e-9) / (iters - 1)

    t_u8s = per_token(build_step(qp_u8s))

    # The reference's ACTUAL algorithm (lstm_models/generate.py:36-46):
    # fp32 model, one dispatch per generated token.  vs_baseline
    # (quantized scan vs fp32 scan, < 1 on a single chip where weights
    # are already VMEM-resident) must not read as "quantization lost" —
    # the honest comparison pair is both ratios side by side (VERDICT
    # r4 next #7): the one-scan serving design beats the reference
    # algorithm ~5-7x regardless of quantization, and packing pays off
    # in the dispatch-per-token / sharded / > VMEM regimes (PERF.md).
    @jax.jit
    def _f_step(p, tok, hidden):
        logp, hidden = lstm_lm.apply(p, tok, hidden)
        nxt = jnp.argmax(logp[-1]).reshape(1, 1).astype(jnp.int32)
        return nxt, hidden

    t_ref = per_token(lambda tok, h: _f_step(params, tok, h))

    def _leaf_bytes(tree):
        return sum(a.size * a.dtype.itemsize
                   for a in jax.tree_util.tree_leaves(tree)
                   if hasattr(a, "dtype"))

    step_bytes = _leaf_bytes(qp_u8s) - _leaf_bytes(qp_u8s["encoder"])
    resident_mb = (_leaf_bytes(qparams) - _leaf_bytes(qparams["encoder"])
                   ) / 1e6
    ceiling = _copy_ceiling(jnp.zeros((4096, 4096), jnp.float32))
    stream = step_bytes / t_u8s / 1e9
    return {
        "metric": "lstm_generate_tokens_per_s",
        "value": round(1.0 / t_scan_q, 1),
        "unit": "tokens/s",
        "vs_baseline": round(t_scan_f / t_scan_q, 3),
        "vs_reference_algo": round(t_ref / t_scan_q, 3),
        "reference_algo_tokens_per_s": round(1.0 / t_ref, 1),
        "batch64_tokens_per_s": round(BATCH / t_scan_b, 1),
        "resident_mb": round(resident_mb, 1),
        "dispatch_u8s": round(1.0 / t_u8s, 1),
        "stream_gbs": round(stream, 1),
        "copy_ceiling": round(ceiling, 1),
        "pct_ceiling": round(100 * stream / ceiling, 1),
    }


def bench_transformer_generate() -> dict:
    """``bench.py tfgen``: Transformer generation (batch 1) — KV-cache
    incremental decoding with every converted linear packed to the
    9-bit u8s format, vs the reference generate.py algorithm (fp32
    full-prefix re-forward per token, generate.py:60-65) on the same
    model, both as ONE jitted lax.scan.

    Why incremental: full-prefix decoding re-multiplies ALL n prefix
    rows through every dense each step (O(n^2) total); KV-cache
    decoding (``transformer_lm.decode_step``, exactness tested against
    the full forward) is one row per dense per token.  At this model
    size the scan's weights are VMEM-resident (PERF.md "Generation at
    VMEM residency"), so the quantized-unpacked sampler is the fast
    serving mode; ``incr_u8s`` keeps the packed-stream mode measurable
    (the regime for > VMEM models).  value = marginal tokens/s (slope
    between 6 and 12 chained 288-token scans, both device-bound — see
    ``_chain_rate``); vs_baseline = the reference algorithm (fp32
    full-prefix re-forward, generate.py:60-65)."""
    from tq_tpu.models import transformer_lm

    vocab, emsize, nhid, nlayers, nhead = 33278, 650, 650, 2, 2
    params = transformer_lm.init(jax.random.PRNGKey(0), vocab=vocab,
                                 emsize=emsize, nhead=nhead, nhid=nhid,
                                 nlayers=nlayers)
    qp, qcfg, qs = transformer_lm.convert(params, 8, 8, 24, 8, 8)
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    qp_u8s = transformer_lm.pack(qp, qcfg, fmt="u8s")

    WORDS = 288
    L = WORDS + 1

    def make_full_prefix():
        """The reference's algorithm: fp32, re-forward the prefix."""

        @jax.jit
        def run(params, tok0, key):
            buf = jnp.zeros((L, 1), jnp.int32).at[0, 0].set(tok0[0, 0])

            def step(buf, key_n):
                key, n = key_n
                logp = transformer_lm.apply(params, buf, nhead=nhead)
                logits = jax.lax.dynamic_slice_in_dim(logp, n, 1, 0)[0]
                tok = jax.random.categorical(key, logits)
                buf = jax.lax.dynamic_update_slice(
                    buf, tok.reshape(1, 1).astype(jnp.int32), (n + 1, 0))
                return buf, tok

            keys = jax.random.split(key, WORDS)
            _, toks = jax.lax.scan(step, buf, (keys, jnp.arange(WORDS)))
            return toks[-1].reshape(1, 1)

        return lambda tok: run(params, tok, jax.random.PRNGKey(0))

    def make_incremental(mode):
        """mode: 'q' fake-quant unpacked, 'u8s' packed, 'f' fp32."""
        p = {"q": qp, "u8s": qp_u8s, "f": params}[mode]
        cfg = qcfg if mode != "f" else None

        @jax.jit
        def run(p, qs, tok0, key):
            cache = transformer_lm.decode_init_cache(
                L, 1, emsize, nhead, nlayers)

            def step(carry, key_n):
                tok, cache = carry
                key, n = key_n
                logp, cache = transformer_lm.decode_step(
                    p, tok, n, cache, nhead=nhead, qcfg=cfg,
                    qstate=qs if cfg else None)
                tok = jax.random.categorical(key, logp[0]).reshape(
                    1, 1).astype(jnp.int32)
                return (tok, cache), tok[0, 0]

            keys = jax.random.split(key, WORDS)
            (tok, _), _ = jax.lax.scan(step, (tok0, cache),
                                       (keys, jnp.arange(WORDS)))
            return tok

        return lambda tok: run(p, qs, tok, jax.random.PRNGKey(0))

    t_q = _chain_rate(make_incremental("q"), WORDS)
    t_u8s = _chain_rate(make_incremental("u8s"), WORDS, k1=2, k2=4)
    # Both baselines (VERDICT r4 next #7): the reference's algorithm
    # (fp32 full-prefix re-forward) AND the fp32 version of the same
    # KV-cache scan, so the JSON separates the serving-design win from
    # the quantization delta.
    t_f = _chain_rate(make_incremental("f"), WORDS)
    t_ref = _chain_rate(make_full_prefix(), WORDS, k1=3, k2=6)

    def _leaf_bytes(tree):
        return sum(a.size * a.dtype.itemsize
                   for a in jax.tree_util.tree_leaves(tree)
                   if hasattr(a, "dtype"))

    stream_bytes = _leaf_bytes(qp_u8s) - _leaf_bytes(qp_u8s["encoder"])
    resident_mb = (_leaf_bytes(qp) - _leaf_bytes(qp["encoder"])) / 1e6
    return {
        "metric": "transformer_generate_tokens_per_s",
        "value": round(1.0 / t_q, 1),
        "unit": "tokens/s",
        "vs_baseline": round(t_ref / t_q, 3),
        "vs_fp32_scan": round(t_f / t_q, 3),
        "resident_mb": round(resident_mb, 1),
        "incr_u8s": round(1.0 / t_u8s, 1),
        "u8s_stream_gbs": round(stream_bytes / t_u8s / 1e9, 1),
    }


def _init_backend(retries: int = 4, base_delay: float = 5.0) -> str:
    """Touch the backend with retry-and-backoff.

    On this rig the TPU plugin can transiently fail to initialize
    (BENCH_r02 died at the first ``jax.default_backend()`` call with
    UNAVAILABLE).  JAX caches a *failed* backend init, so a bare retry
    of ``jax.devices()`` in the same process would re-raise the cached
    error; ``jax.extend.backend.clear_backends`` resets that cache
    between attempts.  After the last failed attempt, fall back to CPU
    (``JAX_PLATFORMS=cpu`` honoured at next init) so every metric still
    produces a line — tagged with ``"backend": "cpu"`` so a CPU-degraded
    record can't be mistaken for a TPU one.
    """
    last_err = None
    for attempt in range(retries):
        try:
            backend = jax.default_backend()
            jnp.zeros(()).block_until_ready()
            return backend
        except Exception as e:  # noqa: BLE001 — init errors vary by plugin
            last_err = e
            print(json.dumps({
                "event": "backend_init_retry",
                "attempt": attempt + 1,
                "error": f"{type(e).__name__}: {e}"[:300],
            }), file=sys.stderr, flush=True)
            try:
                jax.extend.backend.clear_backends()
            except Exception:
                pass
            time.sleep(base_delay * (attempt + 1))
    # Degrade to CPU rather than crash the whole record.
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.extend.backend.clear_backends()
    except Exception:
        pass
    try:
        backend = jax.default_backend()
        print(json.dumps({
            "event": "backend_degraded",
            "backend": backend,
            "error": f"{type(last_err).__name__}: {last_err}"[:300],
        }), file=sys.stderr, flush=True)
        return backend
    except Exception as e:  # truly nothing works
        print(json.dumps({
            "event": "backend_unavailable",
            "error": f"{type(e).__name__}: {e}"[:300],
        }), file=sys.stderr, flush=True)
        return "none"


def _safe(name: str, make, backend: str) -> bool:
    """Run one metric; print its JSON line, or a structured error line.

    Returns True iff a line was printed (always, barring stdout loss) —
    a metric failure must never take down the rest of the suite
    (VERDICT r2 missing #1)."""
    try:
        rec = make()
        if backend != "tpu":
            rec["backend"] = backend  # flag degraded records
        print(json.dumps(rec), flush=True)
    except Exception as e:  # noqa: BLE001 — isolate per metric
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": name,
            "error": f"{type(e).__name__}: {e}"[:300],
            "backend": backend,
        }), flush=True)
    return True


# metric name -> (bench.py subcommand argv, expected warm-cache secs).
# The full suite runs each metric in its OWN subprocess: measured in
# round 3, running them sequentially in one process degrades the later
# metrics up to 2x (12.6k vs 26.4k imgs/s for the int8-UQ row) —
# compile-cache and device-state pollution from the earlier benches —
# and a hard crash (segfault/OOM) in one metric would otherwise kill
# the record.
#
# ORDER MATTERS: end-to-end serving headlines first (VERDICT r3 next
# #1 — when the driver's outer wall-clock is shorter than the suite,
# whatever runs last is lost, and for two rounds that was exactly the
# end-to-end evidence).  The 7-bit TR int8 row leads (VERDICT r4 next
# #3: the TR-beats-fp32 setting must be in the driver record).  Kernel
# micro-metrics close the list; quantize runs LAST: it is the most
# stable across rounds (203-205 GB/s every round), so when the global
# budget runs dry it is the right line to lose.
#
# The expected-secs weights drive the per-metric caps (see _run_suite):
# round-4/5 measured warm-cache wall-clocks, padded ~1.5x.
SUITE = (
    # End-to-end serving headlines:
    ("resnet18_tr_inference_int8_bf16io", ["resnet", "int8", "bf16"], 150),
    ("resnet18_uq_inference_int8_bf16io",
     ["resnet", "int8", "uq", "bf16"], 60),
    ("resnet18_tr_inference_bf16io", ["resnet", "bf16"], 240),
    ("lstm_tr_tokens_per_s", ["lstm"], 90),
    # beyond-reference serving: packed-weight-streaming generation
    ("lstm_generate_tokens_per_s", ["generate"], 90),
    ("transformer_generate_tokens_per_s", ["tfgen"], 60),
    # Kernel micro-metrics:
    ("term_matmul_fused", ["matmul"], 60),
    ("term_matmul_int8", ["matmul", "int8"], 90),
    ("tr_quantize_bandwidth", ["quantize"], 60),
)


def _run_suite() -> int:
    """Spawn one subprocess per metric under a global wall-clock budget;
    always emit one line per SUITE entry (value, error, or skip).

    Per-metric caps are DYNAMIC (VERDICT r4 next #1 — a flat 600 s cap
    inside a 1200 s budget let one stuck metric eat half the record):
    metric i gets ``remaining * w_i / sum(remaining weights)`` where
    ``w_i`` is its expected warm wall-clock, floored at 60 s and capped
    by TQ_BENCH_METRIC_S and the remaining budget.  Fast metrics return
    their unused time to the pool, so the caps adapt upward as the
    suite runs ahead of schedule — and a single congested-tunnel stall
    can never take more than its weighted share.
    """
    import os
    import subprocess

    budget = float(os.environ.get("TQ_BENCH_BUDGET_S", "1200"))
    metric_cap = float(os.environ.get("TQ_BENCH_METRIC_S", "600"))
    # Congestion adaptation: if a metric exceeds this (warm-cache runs
    # are ~10-240 s), the tunnel's enqueue rate has collapsed (observed:
    # the same warm-cache metric at 577 s) — flip TQ_BENCH_FAST=1 for
    # the remaining subprocesses so shorter chains keep every metric
    # inside the budget (noisier values beat budget-skips).
    fast_thresh = float(os.environ.get("TQ_BENCH_FAST_THRESH_S", "300"))
    child_env = dict(os.environ)
    cache_dir = "/tmp/tq_jax_cache"
    t_start = time.perf_counter()

    def _cache_entries():
        try:
            return len(os.listdir(cache_dir))
        except OSError:
            return 0

    def _run_one(name, argv, cap, weight, remaining, retry=False):
        """Run one metric subprocess; print its line.  Returns True if a
        VALUE line (not an error) was printed."""
        t_m = time.perf_counter()
        entries0 = _cache_entries()
        ok = False
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *argv],
                capture_output=True, text=True, env=child_env,
                timeout=cap,
            )
            line = None
            for ln in reversed(proc.stdout.splitlines()):
                ln = ln.strip()
                if ln.startswith("{"):
                    line = ln
                    break
            secs = round(time.perf_counter() - t_m, 1)
            if line is not None:
                try:
                    rec = json.loads(line)
                    rec["secs"] = secs
                    if retry:
                        rec["retry"] = True
                    ok = "value" in rec
                    line = json.dumps(rec)
                except ValueError:
                    pass
                print(line, flush=True)
            else:
                tail = (proc.stderr or proc.stdout or "").strip()[-300:]
                print(json.dumps({
                    "metric": name, "secs": secs, "error":
                    f"rc={proc.returncode}, no JSON line: {tail}",
                }), flush=True)
        except subprocess.TimeoutExpired:
            # Name the binding constraint honestly (round-4's record
            # blamed "per-metric cap" for a remaining-budget kill).
            which = ("per-metric cap" if cap == metric_cap
                     else "remaining budget" if cap >= remaining
                     else "weighted share")
            print(json.dumps({
                "metric": name,
                "secs": round(time.perf_counter() - t_m, 1),
                "error": f"timeout ({which}, cap {round(cap)}s)"
                         + (" on retry" if retry else ""),
            }), flush=True)
            # A timeout anywhere means the tunnel is congested — run
            # the remaining subprocesses in fast mode.
            child_env["TQ_BENCH_FAST"] = "1"
        except Exception as e:  # noqa: BLE001 — keep the record alive
            print(json.dumps({
                "metric": name,
                "error": f"{type(e).__name__}: {e}"[:300],
            }), flush=True)
        # Compile-cache health: entry delta per metric (stderr — stdout
        # stays one-JSON-line-per-metric).  A warm run shows delta 0.
        print(json.dumps({
            "event": "compile_cache", "metric": name,
            "entries_before": entries0, "entries_after": _cache_entries(),
        }), file=sys.stderr, flush=True)
        secs_m = time.perf_counter() - t_m
        if (secs_m > min(fast_thresh, 3 * weight)
                and child_env.get("TQ_BENCH_FAST") != "1"):
            child_env["TQ_BENCH_FAST"] = "1"
            print(json.dumps({
                "event": "congested_window", "metric": name,
                "metric_s": round(secs_m, 1), "action": "TQ_BENCH_FAST=1",
            }), file=sys.stderr, flush=True)
        return ok

    printed = 0
    failed: list = []
    for i, (name, argv, weight) in enumerate(SUITE):
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < 45:
            # Not enough room to produce a trustworthy number — emit a
            # structured skip instead of being killed mid-metric.
            print(json.dumps({
                "metric": name, "skipped": "budget",
                "remaining_s": round(remaining, 1),
            }), flush=True)
            printed += 1
            continue
        weight_left = sum(w for _, _, w in SUITE[i:])
        cap = min(metric_cap, remaining,
                  max(60.0, remaining * weight / weight_left))
        if not _run_one(name, argv, cap, weight, remaining):
            failed.append((name, argv, weight))
        printed += 1

    # Retry pass (round 5): this rig's tunnel congestion comes in
    # minute-scale waves — a metric that timed out in one wave often
    # runs clean minutes later.  Spend whatever budget the healthy
    # metrics left on fast-mode retries, cycling failed metrics until
    # the budget runs out or everything has a value (later value lines
    # for the same metric supersede the earlier error lines).
    child_env["TQ_BENCH_FAST"] = "1"
    for _round in range(3):
        still = []
        for j, (name, argv, weight) in enumerate(failed):
            remaining = budget - (time.perf_counter() - t_start)
            if remaining < 60:
                still.extend(failed[j:])
                break
            cap = min(metric_cap, remaining, max(90.0, 1.5 * weight))
            if not _run_one(name, argv, cap, weight, remaining,
                            retry=True):
                still.append((name, argv, weight))
        failed = still
        if not failed or budget - (time.perf_counter() - t_start) < 60:
            break
    return printed


def main():
    if len(sys.argv) > 1:
        backend = _init_backend()
        if sys.argv[1] == "lstm":
            _safe("lstm_tr_tokens_per_s", bench_lstm, backend)
            return
        if sys.argv[1] == "generate":
            _safe("lstm_generate_tokens_per_s", bench_generate, backend)
            return
        if sys.argv[1] == "tfgen":
            _safe("transformer_generate_tokens_per_s",
                  bench_transformer_generate, backend)
            return
        if sys.argv[1] == "matmul":
            _safe("term_matmul",
                  lambda: bench_matmul(int8="int8" in sys.argv), backend)
            return
        if sys.argv[1] == "resnet":
            _safe("resnet18_inference",
                  lambda: bench_resnet(int8="int8" in sys.argv,
                                       uq="uq" in sys.argv,
                                       bf16="bf16" in sys.argv), backend)
            return
        if sys.argv[1] == "quantize":
            _safe("tr_quantize_bandwidth", bench_quantize, backend)
            return
    # rc=0 whenever the record carries at least one line (value or
    # structured error) — never hand the driver an unparseable rc=1.
    sys.exit(0 if _run_suite() else 1)


if __name__ == "__main__":
    main()
