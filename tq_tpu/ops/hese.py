"""HESE (hybrid encoding of signed expressions) as vectorized bit-plane math.

Semantic reference: the MSB-down sliding-window automaton in the reference's
CUDA kernel (``kernels/tr_cuda_kernel.cu:15-56``) and its Python twin
(``bit_utils.py:10-44``).  The automaton scans a non-negative integer ``q``
from the most significant bit with a 3-bit window ``(b2, b1, b0)`` =
(bit above, current bit, bit below) and emits signed power-of-two terms:

    (0,1,0) -> +2^i   (and skips the bit below)
    (0,1,1) -> +2^(i+1)
    (1,1,0) -> -2^i
    otherwise nothing.

Key observation enabling a TPU-native design: the only "skip" (case 010)
skips a bit that is provably zero, so the automaton is *memoryless* — the
signed digit emitted at magnitude position ``p`` is a pure function of bits
``(p+1, p, p-1, p-2)`` of ``q``:

    d_p = +1  iff  (~b[p+1] &  b[p] & ~b[p-1])        # isolated 1 at p
               or  (~b[p]   &  b[p-1] & b[p-2])       # run starting below p
    d_p = -1  iff  ( b[p+1] &  b[p] & ~b[p-1])        # bottom of a run

(bits below index 0 are zero).  At most one term is emitted per position, so
the encoding of ``q`` is a vector of digit planes ``d in {-1,0,+1}^(bits+1)``
with value ``q = sum_p d_p * 2^p``.  This removes all data-dependent control
flow: encode, group-wise selection and decode become static-shaped
element-wise ops + tiny reductions, which XLA maps onto the VPU and fuses
with the surrounding compute.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "hese_digit_planes",
    "hese_terms_count",
    "num_planes",
    "transition_merge_terms_np",
]


def num_planes(bits: int) -> int:
    """Number of digit planes needed for values in [0, 2**bits - 1].

    The top run of a ``bits``-wide value emits at position ``bits`` (case
    011 at bit ``bits - 1``), so ``bits + 1`` planes suffice.
    """
    return bits + 1


def _bit(q, k: int):
    """Bit ``k`` of integer array ``q`` (0 for negative k)."""
    if k < 0:
        return jnp.zeros_like(q)
    return (q >> k) & 1


def hese_digit_planes(q, bits: int):
    """Decompose non-negative int32 ``q`` into HESE signed digit planes.

    Args:
      q: int32 array, values in ``[0, 2**bits - 1]``.
      bits: bit width of the uniform quantization grid.

    Returns:
      int32 array of shape ``q.shape + (bits + 1,)`` with entries in
      {-1, 0, +1}; plane ``p`` carries magnitude ``2**p`` and
      ``q == sum_p planes[..., p] << p``.  Per element the nonzero planes
      are exactly the reference automaton's terms (distinct magnitudes,
      so "decreasing magnitude order" == descending plane index).
    """
    T = num_planes(bits)
    planes = []
    for p in range(T):
        b_up = _bit(q, p + 1)
        b_cur = _bit(q, p)
        b_dn1 = _bit(q, p - 1)
        b_dn2 = _bit(q, p - 2)
        pos = ((1 - b_up) & b_cur & (1 - b_dn1)) | ((1 - b_cur) & b_dn1 & b_dn2)
        neg = b_up & b_cur & (1 - b_dn1)
        planes.append(pos - neg)
    return jnp.stack(planes, axis=-1).astype(jnp.int32)


def hese_digit_planes_np(q: np.ndarray, bits: int) -> np.ndarray:
    """NumPy twin of :func:`hese_digit_planes` (for host-side tooling)."""
    q = np.asarray(q, dtype=np.int64)
    T = num_planes(bits)
    out = np.zeros(q.shape + (T,), dtype=np.int32)
    for p in range(T):
        b_up = (q >> (p + 1)) & 1
        b_cur = (q >> p) & 1
        b_dn1 = (q >> (p - 1)) & 1 if p >= 1 else np.zeros_like(q)
        b_dn2 = (q >> (p - 2)) & 1 if p >= 2 else np.zeros_like(q)
        pos = ((1 - b_up) & b_cur & (1 - b_dn1)) | ((1 - b_cur) & b_dn1 & b_dn2)
        neg = b_up & b_cur & (1 - b_dn1)
        out[..., p] = pos - neg
    return out


def binary_digit_planes(q, bits: int):
    """Plain binary bit-plane expansion (reference ``expand_binary_bits``,
    bit_utils.py:63-73): plane ``p`` is bit ``p`` of ``q`` in {0, 1}.

    Together with :func:`hese_digit_planes` this supports the empirical
    term-pair cost validation the reference does by convolving bit
    planes (visualize/term_group_dist.py:101-110): the number of
    term-pair multiplications of a dot product equals the sum over
    plane pairs of (nonzero count in data plane) x (nonzero count in
    weight plane).
    """
    T = num_planes(bits)
    planes = [_bit(q, p) for p in range(T)]
    return jnp.stack(planes, axis=-1).astype(jnp.int32)


def transition_merge_terms_np(q) -> np.ndarray:
    """Term counts per the reference's *root-level* ``hese()`` with its
    "merging neighbors hack" (``tr_layer.py:10-41``) — the counter behind
    every published compressed-HESE ``param_bits`` column.

    That function is not the CUDA automaton: it emits one signed term per
    0<->1 *transition* of ``|q|`` (padded with zeros on both ends), so a
    maximal run of 1s from bit ``a`` to bit ``b`` yields the exact pair
    ``(-2^a, +2^(b+1))``.  Transitions come in such pairs, the exponent
    list is always even-length, and the fixed pairing ``(0,1),(2,3),...``
    of the merging hack therefore aligns pairs with runs exactly: a
    length-1 run (``b == a``) satisfies ``exponents[i+1] == -2*exponents[i]``
    and collapses to one term; every longer run keeps two.  Hence

        terms(q) = 2 * (#maximal 1-runs of |q|) - (#length-1 runs)

    with ``terms(0) == 0`` (``bin(0)`` has no transitions).  This differs
    from the sound CSD count of :func:`hese_terms_count` — e.g.
    ``0b110111 = 55`` is 3 CSD terms (+64-8-1) but two runs -> 4 here —
    which is why the published mnist-tr/lstm-tr param_bits cannot be
    reproduced by a sound HESE counter (PARITY.md quantifies the gap).

    Returns an int64 array of ``q``'s shape.
    """
    q = np.abs(np.asarray(q, dtype=np.int64))
    starts = q & ~(q << 1)          # bit set, bit below clear: run start
    singles = starts & ~(q >> 1)    # ... and bit above clear: length-1 run
    nbits = int(q.max()).bit_length() if q.size else 0
    runs = np.zeros(q.shape, dtype=np.int64)
    ones = np.zeros(q.shape, dtype=np.int64)
    for p in range(nbits):
        runs += (starts >> p) & 1
        ones += (singles >> p) & 1
    return 2 * runs - ones


def hese_terms_count(q, bits: int):
    """Number of HESE terms per element (Hamming weight of the digit planes).

    Used by the efficiency model's compressed-HESE parameter-bit counter
    (reference ``tr_layer.py:57-63``).
    """
    return jnp.sum(jnp.abs(hese_digit_planes(q, bits)), axis=-1)
