"""Property tests for the HESE digit-plane decomposition.

Mirrors the reference's implicit cross-check strategy (HESE implemented 4x
in the reference, SURVEY.md §4): our vectorized planes must agree with the
sequential automaton oracle on every representable value.
"""

import numpy as np
import pytest

from tq_tpu.ops.hese import (
    hese_digit_planes,
    hese_digit_planes_np,
    hese_terms_count,
    num_planes,
)
from tq_tpu.ops.oracle import hese_encode_oracle


@pytest.mark.parametrize("bits", [2, 3, 4, 6, 8, 9, 16])
def test_planes_reconstruct_exhaustive(bits):
    """sum_p d_p * 2^p == q for every q in [0, 2^bits)."""
    q = np.arange(2**bits, dtype=np.int32)
    planes = np.asarray(hese_digit_planes(q, bits))
    pow2 = 2 ** np.arange(num_planes(bits))
    np.testing.assert_array_equal((planes * pow2).sum(-1), q)


@pytest.mark.parametrize("bits", [4, 8, 9])
def test_planes_match_automaton_exhaustive(bits):
    """Digit planes == the sequential automaton's terms, value by value."""
    all_planes = np.asarray(
        hese_digit_planes(np.arange(2**bits, dtype=np.int32), bits)
    )
    for q in range(2**bits):
        got = sorted(
            int(d) * (1 << p) for p, d in enumerate(all_planes[q]) if d != 0
        )
        want = sorted(hese_encode_oracle(float(q), 1.0, bits))
        assert got == want, f"q={q}: {got} != {want}"


@pytest.mark.parametrize("bits", [8, 9])
def test_one_term_per_plane(bits):
    """The automaton emits at most one term per magnitude position."""
    q = np.arange(2**bits, dtype=np.int32)
    planes = np.asarray(hese_digit_planes(q, bits))
    assert np.abs(planes).max() <= 1


@pytest.mark.parametrize("bits", [6, 9])
def test_term_count_at_most_half_bits(bits):
    """HESE is a minimal-weight-style encoding: <= ceil((bits+1)/2) terms."""
    q = np.arange(2**bits, dtype=np.int32)
    counts = np.asarray(hese_terms_count(q, bits))
    assert counts.max() <= (bits + 2) // 2 + 1
    # and strictly fewer terms than set bits for run-heavy values
    assert counts[2**bits - 1] == 2  # 0b111..1 -> 2^bits - 1


def test_numpy_twin_matches_jax():
    q = np.arange(512, dtype=np.int32)
    np.testing.assert_array_equal(
        hese_digit_planes_np(q, 9), np.asarray(hese_digit_planes(q, 9))
    )


class TestTransitionMergeTerms:
    """The merging-neighbors counter behind the published param_bits
    (reference root-level ``hese()``, tr_layer.py:10-41)."""

    def test_matches_reference_hese_exhaustive(self):
        """Bit-exact against the reference's own hese() on every value a
        10-bit TR grid can produce (both signs)."""
        from reference_harness import load_reference
        from tq_tpu.ops.hese import transition_merge_terms_np

        ref = load_reference()
        q = np.arange(-1024, 1025, dtype=np.int64)
        got = transition_merge_terms_np(q)
        for v, g in zip(q.tolist(), got.tolist()):
            assert g == len(ref.tr_layer.hese(v)), v

    def test_closed_form_examples(self):
        from tq_tpu.ops.hese import transition_merge_terms_np

        # 0 -> no transitions; isolated bit -> merged to 1 term;
        # run of >=2 -> 2 terms; 55 = 0b110111 (two runs) -> 4, although
        # sound CSD needs only 3 (+64 -8 -1).
        got = transition_merge_terms_np(np.array([0, 1, 4, 3, 6, 55, -55]))
        np.testing.assert_array_equal(got, [0, 1, 1, 2, 2, 4, 4])

    def test_compressed_bits_merge_hack_matches_reference(self):
        """compressed_hese_bits(merge_hack=True) == the reference's
        compute_compressed_hese on the same tensor (tr_layer.py:57-63)."""
        import torch

        from reference_harness import load_reference
        from tq_tpu.profilers import compressed_hese_bits

        ref = load_reference()
        rng = np.random.default_rng(7)
        sf = 0.03125
        w = (rng.integers(-255, 256, size=(64, 32)) * sf).astype(np.float32)
        for base in (8, 9, 12, 16):
            want = ref.tr_layer.compute_compressed_hese(
                torch.from_numpy(w), sf, base
            )
            got = compressed_hese_bits(w, sf, base, base, merge_hack=True)
            assert got == want
