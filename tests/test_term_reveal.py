"""Equivalence tests: vectorized term_reveal vs the sequential oracle.

Also pins the degenerate-setting sanity anchors the reference relies on
(SURVEY.md §4): with group_size=1 and terms >= bits the op must reduce to
plain uniform quantization.
"""

import numpy as np
import pytest

from tq_tpu.ops.oracle import term_reveal_oracle
from tq_tpu.ops.term_reveal import term_reveal, uniform_quantize


def _uq_reference(x, sf, bits):
    maxq = 2**bits - 1
    q = np.minimum(np.floor(np.abs(x) / sf + 0.5), maxq)
    return np.where(x < 0, -1.0, 1.0) * q * sf


@pytest.mark.parametrize("bits", [4, 8, 9])
@pytest.mark.parametrize("group_size,budget", [(1, 3), (1, 8), (4, 6), (8, 12), (16, 20), (32, 32)])
def test_matches_oracle_random(rng, bits, group_size, budget):
    x = rng.normal(0, 1, size=(3, 64)).astype(np.float32)
    sf = 0.05
    got = np.asarray(
        term_reveal(x, sf, bits, group_size, budget, axis=-1)
    )
    want = term_reveal_oracle(x, sf, bits, group_size, budget)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_matches_oracle_with_ties(rng):
    """Equal-magnitude terms across a group: lowest element index wins."""
    # Construct values whose top HESE terms collide in magnitude.
    x = np.array([[6.0, 4.0, 4.0, -4.0, 6.0, -6.0, 2.0, 4.0]], np.float32)
    for budget in range(1, 10):
        got = np.asarray(term_reveal(x, 1.0, 4, 8, budget, axis=-1))
        want = term_reveal_oracle(x, 1.0, 4, 8, budget)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"budget={budget}")


@pytest.mark.parametrize("bits", [4, 6, 9])
def test_degenerates_to_uniform_quantization(rng, bits):
    """g=1, budget >= max terms  ==>  plain uniform quantization."""
    x = rng.normal(0, 2, size=(128,)).astype(np.float32)
    sf = 0.03
    got = np.asarray(term_reveal(x, sf, bits, 1, bits + 1, axis=-1))
    np.testing.assert_allclose(got, _uq_reference(x, sf, bits), atol=1e-5)


def test_group_axis_and_padding(rng):
    """Grouping along a middle axis; trailing short group is well-defined."""
    x = rng.normal(0, 1, size=(2, 10, 3, 3)).astype(np.float32)  # C=10, g=4
    got = np.asarray(term_reveal(x, 0.1, 8, 4, 6, axis=1))
    # oracle: move axis 1 to the back, pad handled by short final group
    xm = np.moveaxis(x, 1, -1)
    want = np.moveaxis(term_reveal_oracle(xm, 0.1, 8, 4, 6), -1, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_zero_budget_zeroes_everything(rng):
    x = rng.normal(size=(16,)).astype(np.float32)
    out = np.asarray(term_reveal(x, 0.1, 8, 4, 0, axis=-1))
    np.testing.assert_array_equal(out, np.zeros_like(x))


def test_budget_larger_than_terms_is_lossless_vs_uq(rng):
    """Early-exit semantics: oversized budget keeps every term."""
    x = rng.normal(0, 1, size=(8,)).astype(np.float32)
    a = np.asarray(term_reveal(x, 0.1, 8, 8, 10_000, axis=-1))
    np.testing.assert_allclose(a, _uq_reference(x, 0.1, 8), atol=1e-5)


def test_uniform_quantize_rounding():
    """int(|x|/sf + 0.5) semantics: round-half-up on magnitudes."""
    x = np.array([0.049, 0.05, 0.149, -0.151, 25.0], np.float32)
    q, sign = uniform_quantize(x, 0.1, 4)
    np.testing.assert_array_equal(np.asarray(q), [0, 1, 1, 2, 15])
    np.testing.assert_array_equal(np.asarray(sign), [1, 1, 1, -1, 1])


def test_dtype_and_shape_preserved(rng):
    x = rng.normal(size=(4, 32, 3, 3)).astype(np.float32)
    out = term_reveal(x, 0.1, 8, 8, 12, axis=1)
    assert out.shape == x.shape and out.dtype == x.dtype


def test_serial_keep_mode_models_hardware_truncator():
    """'serial' keeps the FIRST budget terms LSB-first (the FPGA
    comparator/truncator, concatenator_truncator.v:33-52), unlike the
    CUDA kernel's largest-first merge."""
    import jax.numpy as jnp

    # 21 = 10101b -> HESE terms {+16, +4, +1}; sf=1, one group of 1.
    x = jnp.asarray([21.0])
    largest = term_reveal(x, 1.0, 6, 1, 2, axis=0)
    serial = term_reveal(x, 1.0, 6, 1, 2, axis=0, keep_mode="serial")
    assert float(largest[0]) == 20.0  # 16 + 4
    assert float(serial[0]) == 5.0    # 1 + 4
    # Unbounded budget: both reconstruct exactly.
    assert float(term_reveal(x, 1.0, 6, 1, 8, axis=0,
                             keep_mode="serial")[0]) == 21.0


def test_serial_keep_mode_grouped():
    import jax.numpy as jnp

    # Group of 2: values 5 (101 -> {4,1}) and 2 ({2}); budget 2.
    x = jnp.asarray([5.0, 2.0])
    out = term_reveal(x, 1.0, 4, 2, 2, axis=0, keep_mode="serial")
    # LSB-first serial order: plane0 of elem0 (+1), plane1 of elem1 (+2).
    assert out.tolist() == [1.0, 2.0]
    out_l = term_reveal(x, 1.0, 4, 2, 2, axis=0)
    assert out_l.tolist() == [4.0, 2.0]  # largest-first: 4, then 2 beats 1


def test_elementwise_matches_grouped_g1(rng):
    """Loop-free fusable path == the general op at group_size 1."""
    import jax.numpy as jnp

    from tq_tpu.ops.term_reveal import term_reveal_elementwise

    x = jnp.asarray(rng.normal(0, 3, size=(5, 77)), jnp.float32)
    for bits, k in [(9, 3), (8, 6), (6, 1), (16, 4)]:
        a = term_reveal(x, 0.05, bits, 1, k, axis=-1)
        b = term_reveal_elementwise(x, 0.05, bits, k)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
