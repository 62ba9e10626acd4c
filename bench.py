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


def _slope_time(step_fn, x, iters=24):
    """Per-iteration seconds of ``step_fn`` chained ``iters`` times on device."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, sfs, n: int):
        def body(c, sf):
            return step_fn(c, sf), None
        c, _ = jax.lax.scan(body, x, sfs[:n])
        return jnp.sum(c)

    # Slightly varying scale factors defeat any result memoization and
    # keep the chained values from reaching a fixed point.
    sfs = jnp.float32(0.02) * (1.0 + 1e-4 * jnp.arange(iters))

    def timed(n):
        t0 = time.perf_counter()
        float(run(x, sfs, n))  # fetch forces true completion
        return time.perf_counter() - t0

    timed(1)  # compile n=1
    timed(iters)  # compile n=iters
    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(iters) for _ in range(3))
    return max(tn - t1, 1e-9) / (iters - 1)


def main():
    from tq_tpu.kernels.tr_quantize import tr_quantize
    from tq_tpu.ops.term_reveal import term_reveal

    on_tpu = jax.default_backend() == "tpu"
    # ResNet-18-scale activation tensor: batch 64 of stage-2 feature maps.
    shape = (64, 56, 56, 64)
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    bits, terms = 9, 3

    t_fused = _slope_time(
        lambda c, sf: tr_quantize(c, sf, bits, 1, terms, interpret=not on_tpu), x
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
