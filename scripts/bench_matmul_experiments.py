"""term_matmul tuning harness: compare kernel variants back-to-back.

Run-to-run chip contention makes absolute numbers noisy; this script
times all variants inside one process, interleaved round-robin, so the
relative ordering is trustworthy.  Timing is chain-slope (see bench.py)
but the chain is threaded through the *scale factor* scalar rather than
the whole activation tensor: each dispatch's sf depends on the previous
output's mean, which serializes execution on device while adding only a
(M, N) reduction per link — not a (M, K) tensor rebuild.

Usage: python scripts/bench_matmul_experiments.py [M K N]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tq_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tq_tpu.kernels.term_matmul import pack_weight_int, term_matmul
from tq_tpu.kernels.tr_quantize import tr_quantize
from tq_tpu.ops.term_reveal import term_reveal

BITS, TERMS = 8, 3
SF0 = 0.02


def make_chain(mm):
    """One jitted step: sf' = f(mean(mm(x, sf))) — serializes via a scalar."""

    @jax.jit
    def step(x, s):
        y = mm(x, SF0 * (1.0 + 1e-6 * s))
        return jnp.mean(y)

    return step


def slope(step, x, iters=64, reps=5):
    def timed(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(x, s)
        float(s)
        return time.perf_counter() - t0

    timed(2)  # compile + warm
    t1 = [None] * reps
    tn = [None] * reps
    for r in range(reps):  # interleave to share contention
        t1[r] = timed(1)
        tn[r] = timed(iters)
    return max(min(tn) - min(t1), 1e-9) / (iters - 1)


def main():
    argv = sys.argv[1:]
    M, K, N = (int(a) for a in argv[:3]) if len(argv) >= 3 else (8192, 2048, 512)
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)

    # Term-revealed weights (conversion-time, wb=9 g=8 wt=12) + packings.
    w_sf = jnp.max(jnp.abs(w)) / 2 ** (9 - 1)
    w_tr = term_reveal(w.T, w_sf, 9, 8, 12).T  # group along K like conv I
    w_i16, w_sf16 = pack_weight_int(w_tr, w_sf, 9)
    w_tr_bf = w_tr.astype(jnp.bfloat16)

    variants = {}

    def add(name, fn):
        variants[name] = make_chain(fn)

    def vmem_bytes(bm, bk, bn=512, wbytes=4):
        # double-buffered in tiles + acc scratch + out tile
        return 2 * (bm * bk * 4 + bk * bn * wbytes) + bm * bn * 8

    for bm in (256, 512, 1024):
        for bk in (512, 1024, 2048):
            if bk > K or vmem_bytes(bm, bk) > 40 * 2**20:
                continue
            add(
                f"fused fp32w bm{bm} bk{bk}",
                lambda x, sf, bm=bm, bk=bk: term_matmul(
                    x, w_tr, sf, BITS, TERMS, bf16=True, pipeline=False,
                    interpret=not on_tpu, bm=bm, bk=bk),
            )
            for bsub in (128, 256, 512):
                add(
                    f"fused fp32w bm{bm} bk{bk} PIPE/{bsub}",
                    lambda x, sf, bm=bm, bk=bk, bsub=bsub: term_matmul(
                        x, w_tr, sf, BITS, TERMS, bf16=True, pipeline=True,
                        interpret=not on_tpu, bm=bm, bk=bk, bsub=bsub),
                )
    for bm in (512, 1024):
        add(
            f"fused int16w bm{bm} bk1024",
            lambda x, sf, bm=bm: term_matmul(
                x, w_i16, sf, BITS, TERMS, bf16=True,
                interpret=not on_tpu, bm=bm, bk=1024, w_sf=w_sf16),
        )
    add(
        "fused bf16w bm512 bk1024",
        lambda x, sf: term_matmul(
            x, w_tr_bf, sf, BITS, TERMS, bf16=True, pipeline=False,
            interpret=not on_tpu, bm=512, bk=1024),
    )
    add(
        "fused bf16w bm512 bk1024 PIPE",
        lambda x, sf: term_matmul(
            x, w_tr_bf, sf, BITS, TERMS, bf16=True, pipeline=True,
            interpret=not on_tpu, bm=512, bk=1024),
    )

    # --- 9-bit-exact alternatives (VERDICT r2 next #8): can a 9-bit grid
    # ride the int8 MXU by operand splitting, instead of bf16?  A 9-bit
    # magnitude q in [0, 511] with sign splits as q = q_hi*16 + q_lo
    # (two int8-safe halves, |signed| <= 511/16 < 128 and < 16), so
    #   x9 @ w = 16*(x_hi @ w) + (x_lo @ w)  — 2 int8 passes for one-sided
    # 9-bit data against int8 (<=7-bit) weights, 4 passes two-sided.
    w7_sf = jnp.max(jnp.abs(w)) / 2 ** 6
    w7_tr = term_reveal(w.T, w7_sf, 7, 8, 12).T
    w7_i8, w7_sf8 = pack_weight_int(w7_tr, w7_sf, 7)
    w9_hi = jnp.round(w_tr / w_sf / 16.0)
    w9_lo = jnp.round(w_tr / w_sf) - w9_hi * 16.0
    w9_hi8 = w9_hi.astype(jnp.int8)
    w9_lo8 = w9_lo.astype(jnp.int8)

    def two_pass(x, sf):
        # 9-bit data (split hi/lo at quantize time inside the kernel is
        # future work; here the A/B uses the existing kernel twice with
        # bits=5 / bits=4 halves approximated by two int8 calls at the
        # SAME data -> the cost model is what's measured, not accuracy).
        y_hi = term_matmul(x, w7_i8, sf * 16.0, 5, TERMS, int8=True,
                           interpret=not on_tpu, w_sf=w7_sf8)
        y_lo = term_matmul(x, w7_i8, sf, 4, TERMS, int8=True,
                           interpret=not on_tpu, w_sf=w7_sf8)
        return y_hi * 16.0 + y_lo

    def four_pass(x, sf):
        y = None
        for wi, wscale in ((w9_hi8, 16.0), (w9_lo8, 1.0)):
            for bits, dscale in ((5, 16.0), (4, 1.0)):
                t = term_matmul(x, wi, sf * dscale, bits, TERMS, int8=True,
                                interpret=not on_tpu, w_sf=w_sf)
                y = t * (wscale * dscale) if y is None else y + t * (
                    wscale * dscale)
        return y

    add("2-pass int8 (9b data x int8 w)", two_pass)
    add("4-pass int8 (9b x 9b split)", four_pass)
    add(
        "unfused (tr_quantize -> dot)",
        lambda x, sf: jnp.dot(
            tr_quantize(x, sf, BITS, 1, TERMS,
                        interpret=not on_tpu).astype(jnp.bfloat16),
            w_tr_bf, preferred_element_type=jnp.float32),
    )
    add(
        "plain bf16 dot (no quantize)",
        lambda x, sf: jnp.dot(
            (x * (1.0 + 0.0 * sf)).astype(jnp.bfloat16), w_tr_bf,
            preferred_element_type=jnp.float32),
    )

    flops = 2 * M * K * N
    results = {}
    for name, step in variants.items():
        t = slope(step, x)
        results[name] = t
        print(f"{name:36s} {t*1e6:9.1f} us  {flops/t/1e12:7.2f} TF",
              flush=True)
    best = min(results, key=results.get)
    print(json.dumps({"best": best, "us": round(results[best] * 1e6, 1),
                      "tflops": round(flops / results[best] / 1e12, 2)}))


if __name__ == "__main__":
    main()
