"""Native C++ oracle vs Python oracle vs JAX op — triple cross-check.

Mirrors the reference's redundant-implementation test strategy
(SURVEY.md §4: HESE existed 4x there); here the independent
implementations are the Python oracle, the native C++ library, and the
vectorized JAX op, all required to agree bit-exactly.
"""

import shutil
import subprocess

import numpy as np
import pytest

from tq_tpu.ops.oracle import term_reveal_oracle
from tq_tpu.ops.term_reveal import term_reveal

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable",
)


@pytest.fixture(scope="module")
def native():
    from tq_tpu.utils import native as n

    n._load()
    return n


@pytest.mark.parametrize("bits,g,k", [(8, 1, 3), (9, 8, 12), (4, 16, 14),
                                      (6, 5, 7)])
def test_native_matches_python_oracle(native, rng, bits, g, k):
    x = rng.normal(0, 2.0, size=(3, 40)).astype(np.float32)
    sf = 0.05
    ref = term_reveal_oracle(x, sf, bits, g, k)
    out = native.tr_reveal_native(x, sf, bits, g, k)
    # The Python oracle dequantizes in float64, the native lib in
    # float32 — identical integer term selections, 1-ulp dequant noise.
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(
        np.round(out / sf).astype(int), np.round(ref / sf).astype(int)
    )


@pytest.mark.parametrize("bits,g,k", [(8, 1, 3), (9, 8, 12), (9, 32, 40)])
def test_native_matches_jax_at_scale(native, rng, bits, g, k):
    """Large random tensors (too slow for the Python oracle)."""
    import jax.numpy as jnp

    x = rng.normal(0, 3.0, size=(8, 512)).astype(np.float32)
    sf = 0.04
    ref = native.tr_reveal_native(x, sf, bits, g, k)
    out = np.asarray(term_reveal(jnp.asarray(x), sf, bits, g, k, axis=-1))
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_native_term_counts(native):
    q = np.arange(512)
    counts = native.hese_term_counts_native(q, 10)
    from tq_tpu.ops.hese import hese_terms_count
    import jax.numpy as jnp

    ref = np.asarray(hese_terms_count(jnp.asarray(q, jnp.int32), 10))
    np.testing.assert_array_equal(counts, ref)
