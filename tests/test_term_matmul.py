"""Fused term-matmul kernel vs the unfused reference composition."""

import numpy as np
import pytest

import jax.numpy as jnp

from tq_tpu.kernels.term_matmul import term_matmul
from tq_tpu.ops.term_reveal import term_reveal


@pytest.mark.parametrize("M,K,N", [(8, 32, 16), (130, 300, 70), (256, 512, 512)])
@pytest.mark.parametrize("bits,terms", [(8, 3), (9, 9)])
def test_matches_unfused(rng, M, K, N, bits, terms):
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32)
    sf = jnp.float32(0.03)
    ref = jnp.dot(term_reveal(x, sf, bits, 1, terms, axis=-1), w)
    out = term_matmul(x, w, sf, bits, terms, bm=64, bk=128, bn=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_bf16_mode_close(rng):
    x = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 64)) * 0.1, jnp.float32)
    sf = jnp.float32(0.05)
    ref = jnp.dot(term_reveal(x, sf, 8, 1, 3, axis=-1), w)
    out = term_matmul(x, w, sf, 8, 3, bf16=True, bm=64, bk=128, bn=64)
    # 3-term values are exact in bf16; w rounds to 8-bit mantissa.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_oversized_budget_equals_uq_matmul(rng):
    """budget >= bits -> plain uniform quantization feeding the matmul."""
    x = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    sf = jnp.float32(0.02)
    maxq = 2**6 - 1
    q = jnp.clip(jnp.floor(jnp.abs(x) / sf + 0.5), 0, maxq)
    xq = jnp.sign(jnp.where(x < 0, -1.0, 1.0)) * q * sf
    ref = jnp.dot(xq, w)
    out = term_matmul(x, w, sf, 6, 7, bm=32, bk=64, bn=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
