"""Experiment: LUT-gather vs bit-twiddle elementwise term reveal.

TR(q) at group_size=1 is a pure function of the quantized magnitude
q < 2**bits, so a 2**bits-entry int32 table + gather could replace the
~30 int-op mask/popcount/clear chain.  This measures both on a
ResNet-scale activation tensor with the chain-slope harness (see
bench.py for the methodology).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tq_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tq_tpu.kernels.tr_quantize import _topk_value
from tq_tpu.ops.oracle import term_reveal_oracle


def lut_table(bits: int, budget: int) -> np.ndarray:
    qs = np.arange(2**bits, dtype=np.float64)
    out = term_reveal_oracle(qs.reshape(-1, 1), 1.0, bits, 1, budget)
    return np.asarray(out, np.int32).reshape(-1)


def _slope(step_fn, x, iters=50):
    total = jax.jit(jnp.sum)
    sfs = [jnp.float32(0.02 * (1.0 + 1e-4 * i)) for i in range(iters)]

    def timed(n):
        t0 = time.perf_counter()
        c = x
        for i in range(n):
            c = step_fn(c, sfs[i])
        float(total(c))
        return time.perf_counter() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(iters) for _ in range(3))
    return max(tn - t1, 1e-9) / (iters - 1)


def main():
    bits, budget = 7, 3
    shape = (64, 56, 56, 64)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    nbytes = x.size * 4 * 2

    maxq = float(2**bits - 1)
    table = jnp.asarray(lut_table(bits, budget))

    @jax.jit
    def tr_bit(x, sf):
        q = jnp.minimum(jnp.floor(jnp.abs(x) / sf + 0.5), maxq).astype(jnp.int32)
        acc = _topk_value(q, bits, budget)
        return jnp.where(x < 0, -acc, acc).astype(jnp.float32) * sf

    @jax.jit
    def tr_lut(x, sf):
        q = jnp.minimum(jnp.floor(jnp.abs(x) / sf + 0.5), maxq).astype(jnp.int32)
        acc = jnp.take(table, q)
        return jnp.where(x < 0, -acc, acc).astype(jnp.float32) * sf

    # correctness cross-check first
    a = np.asarray(tr_bit(x[:1], jnp.float32(0.02)))
    b = np.asarray(tr_lut(x[:1], jnp.float32(0.02)))
    np.testing.assert_allclose(a, b)
    print("parity OK")

    for name, fn in [("bit-twiddle", tr_bit), ("lut-gather", tr_lut)]:
        dt = _slope(fn, x)
        print(f"{name}: {dt*1e6:.1f} us, {nbytes/dt/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
