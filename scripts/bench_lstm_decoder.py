"""A/B the LSTM decoder matmul paths (round 3: lstm vs_baseline 0.685).

Shape: (35*64, 650) @ (650, 33278) — the tied-decoder projection that
dominates the quantized LSTM forward (97 GFLOP vs 15 GFLOP recurrent).

Variants:
  fp32_dot        plain XLA f32 dot (the fp32 baseline's decoder)
  bf16_dot        plain XLA bf16 dot (speed ceiling for MXU work)
  fused_f32       term_matmul today (f32 MXU operands; tr_dense_apply path)
  fused_f32_bm    same + bm=1120 (divides M -> no M padding waste)
  fused_bf16_i16  int16-packed weights + bf16 MXU (exact for 8-bit grids)
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

from tq_tpu.kernels.term_matmul import (
    pack_weight_int,
    pack_weight_u8s,
    term_matmul,
)
from tq_tpu.layers.common import TRParams, quantize_weight


def slope_time(step, x, iters=50):
    @jax.jit
    def link(x, s):
        return jnp.mean(step(x, jnp.float32(0.02) * (1.0 + 1e-6 * s)))

    def timed(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = link(x, s)
        float(s)
        return time.perf_counter() - t0

    timed(2)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(iters) for _ in range(3))
    return max(tn - t1, 1e-9) / (iters - 1)


def main():
    M, K, N = 35 * 64, 650, 33278
    args = list(sys.argv[1:])
    for a in list(args):  # e.g. M=64: the token-generation batch shape
        if a.startswith("M="):
            M = int(a[2:])
            args.remove(a)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(0.05 * rng.normal(size=(K, N)), jnp.float32)
    tr = TRParams(8, 8, 24, 8, 8)
    w_q, w_sf = quantize_weight(w, tr, axis=0)
    w16, w_sf16 = pack_weight_int(w_q, w_sf, 8)
    wu8 = pack_weight_u8s(w_q, w_sf, 8)
    wb = w_q.astype(jnp.bfloat16)
    flops = 2 * M * K * N

    cases = {
        "fp32_dot": lambda c, sf: jnp.dot(
            c * (1 + 0 * sf), w_q, preferred_element_type=jnp.float32),
        "bf16_dot": lambda c, sf: jnp.dot(
            (c * (1 + 0 * sf)).astype(jnp.bfloat16), wb,
            preferred_element_type=jnp.float32),
        "fused_f32": lambda c, sf: term_matmul(c, w_q, sf, 8, 8),
        "fused_f32_bm1120": lambda c, sf: term_matmul(
            c, w_q, sf, 8, 8, bm=1120),
        "fused_bf16_i16": lambda c, sf: term_matmul(
            c, w16, sf, 8, 8, bf16=True, w_sf=w_sf16),
        "fused_bf16_i16_bm1120": lambda c, sf: term_matmul(
            c, w16, sf, 8, 8, bf16=True, w_sf=w_sf16, bm=1120),
        # 9 bits/weight streaming (pack_weight_u8s): 1.78x less weight
        # HBM than int16 — the lever on weight-bound (small-M) shapes.
        "fused_bf16_u8s": lambda c, sf: term_matmul(
            c, wu8, sf, 8, 8, bf16=True),
        "fused_bf16_u8s_bm1120": lambda c, sf: term_matmul(
            c, wu8, sf, 8, 8, bf16=True, bm=1120),
    }
    only = args or list(cases)
    for name in only:
        t = slope_time(cases[name], x)
        print(f"{name:24s} {t * 1e6:9.1f} us  {flops / t / 1e12:7.2f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
