"""Headline benchmark: fused tr_quantize throughput on one chip.

The reference has no wall-clock numbers (its CUDA kernel is a fidelity
simulator, SURVEY.md §6); the baseline here is the un-fused XLA
(jnp digit-plane) implementation of the identical op — the honest
"what you get without the Pallas kernel" number.  Prints ONE JSON line.

Timing methodology: on this rig device completion signals are
acknowledged at enqueue (block_until_ready returns early over the device
tunnel), so wall-clock around dispatch is meaningless.  Instead the op
runs inside a jitted ``lax.scan`` of N iterations ending in a scalar
reduction that the host *fetches*; per-iteration time is the slope
between N=1 and N=iters, which cancels dispatch/transfer latency.
(Sanity anchor: the same harness measures an 8192^3 bf16 matmul at
~186 TFLOP/s on v5e — 94% of peak — where naive block_until_ready
timing reports an impossible 34 PFLOP/s.)
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: first-ever run pays the (slow, remote)
# compiles; repeat runs of the same configs start in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/tq_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


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
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(iters) for _ in range(3))
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
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(iters) for _ in range(3))
    return max(tn - t1, 1e-9) / (iters - 1)


def bench_matmul():
    """Secondary bench (``bench.py matmul``): fused quantize+matmul vs
    the unfused tr_quantize -> XLA matmul composition (both bf16 MXU
    operands — exact for 8-bit quantization grids), at a
    bandwidth-leaning shape where fusion's saved HBM round-trip of the
    quantized activations shows."""
    from tq_tpu.kernels.term_matmul import term_matmul
    from tq_tpu.kernels.tr_quantize import tr_quantize

    import sys

    on_tpu = jax.default_backend() == "tpu"
    M, K, N = 8192, 2048, 512
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(K, N)), jnp.float32)
    wb = w.astype(jnp.bfloat16)

    if "int8" in sys.argv:
        # True integer serving path: int8 x int8 -> int32 MXU, exact.
        # Applies to any <= 7-bit setting (reference UQ 6/7-bit rows).
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
        print(json.dumps({
            "metric": "term_matmul_int8",
            "value": round(2 * M * K * N / t_f / 1e12, 3),
            "unit": "TFLOP/s",
            "vs_baseline": round(t_u / t_f, 3),
        }))
        return

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
    tflops = 2 * M * K * N / t_f / 1e12
    print(json.dumps({
        "metric": "term_matmul_fused",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(t_u / t_f, 3),
    }))


def bench_resnet():
    """``bench.py resnet``: end-to-end TR-quantized ResNet-18 inference
    throughput (imgs/s) on one chip, vs the fp32 forward as baseline.

    Variants: ``bf16`` (bf16 MXU operands at the reference's 9-bit
    setting) and ``int8`` (7-bit weights+data, int8-packed weights,
    integer MXU convs — the true-integer serving mode)."""
    import sys

    import jax.random as jrandom

    from tq_tpu.convert import convert_cnn, pack_cnn, \
        static_conv_layer_settings
    from tq_tpu.convert.cnn import make_cnn_apply
    from tq_tpu.models import resnet

    bf16 = "bf16" in sys.argv
    int8 = "int8" in sys.argv
    uq = "uq" in sys.argv  # UQ serving: degenerate budget, cheap quantize
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
    print(json.dumps({
        "metric": "resnet18_" + ("uq" if uq else "tr") + "_inference"
        + ("_int8" if int8 else ""),
        "value": round(batch / t_q, 1),
        "unit": "imgs/s",
        "vs_baseline": round(t_f / t_q, 3),
    }))


def main():
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "matmul":
        bench_matmul()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "resnet":
        bench_resnet()
        return
    from tq_tpu.kernels.tr_quantize import tr_quantize
    from tq_tpu.ops.term_reveal import term_reveal

    on_tpu = jax.default_backend() == "tpu"
    # ResNet-18-scale activation tensor: batch 64 of stage-2 feature maps.
    shape = (64, 56, 56, 64)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    bits, terms = 9, 3

    # 200 chained iterations: fully amortizes the residual per-dispatch
    # overhead (at 100 the kernel reads ~45% under its true bandwidth).
    t_fused = _slope_time(
        lambda c, sf: tr_quantize(c, sf, bits, 1, terms, interpret=not on_tpu),
        x, iters=200,
    )
    t_plain = _slope_time(lambda c, sf: term_reveal(c, sf, bits, 1, terms), x)

    nbytes = x.size * 4 * 2  # one read + one write
    gbps = nbytes / t_fused / 1e9
    print(
        json.dumps(
            {
                "metric": "tr_quantize_bandwidth",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(t_plain / t_fused, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
