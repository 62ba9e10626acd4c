"""Vectorized group-wise term revealing (the core TR op), TPU-native.

Behavioural spec: reference CUDA kernel ``kernels/tr_cuda_kernel.cu:59-125``
via the Python entry ``tr_layer.py`` (``tr_cuda.tr(x, sf, bits, g, k)``).
Semantics: uniform-quantize magnitudes onto a ``bits``-bit grid, HESE-encode
each value into signed power-of-two terms, keep the ``num_keep_terms``
largest-magnitude terms per group of ``group_size`` consecutive elements
(ties broken toward the lower element index), discard the rest, and
dequantize.  This is a *fake-quantization* op: output has the input's dtype
and shape and feeds ordinary MXU matmuls/convs.

TPU-native formulation (no sequential merge, no sort):
  the greedy k-way merge of per-element descending term lists emits terms in
  (magnitude desc, element index asc) order — within an element, magnitudes
  are distinct powers of two, so the merge order equals a global stable sort
  by plane index.  Hence a term at (element e, plane p) survives iff

      rank(e, p) = #terms in group at planes > p
                 + #terms at plane p with element index < e   <  budget

  which is two small cumulative sums over static axes (T = bits+1 planes,
  g = group size).  Everything is static-shaped element-wise work that XLA
  fuses; see ``tq_tpu.kernels.tr_quantize`` for the Pallas version.

Deliberate fixes over the reference (SURVEY.md §2.1 quirk list):
  * grouping axis is explicit and correct for non-square spatial dims
    (the reference's ``base_offset`` bug scrambles W != H inputs);
  * trailing groups where the axis length is not divisible by
    ``group_size`` are zero-padded instead of reading out of bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tq_tpu.ops.hese import hese_digit_planes, num_planes

__all__ = ["uniform_quantize", "term_reveal", "term_reveal_st",
           "term_reveal_elementwise", "term_reveal_elementwise_int"]


def uniform_quantize(x, sf, bits: int):
    """Split ``x`` into integer magnitude on the ``bits``-bit grid and sign.

    Reference: ``tr_cuda_kernel.cu:21-23`` —
    ``q = min(int(|x|/sf + 0.5), 2**bits - 1)`` (truncating cast ==
    round-half-up of the magnitude), sign kept separately.

    Returns ``(q, sign)`` with ``q`` int32 in ``[0, 2**bits - 1]`` and
    ``sign`` in {-1.0, +1.0} (sign(0) == +1, matching ``input < 0 ? -1 : 1``).
    """
    maxq = 2**bits - 1
    mag = jnp.floor(jnp.abs(x) / sf + 0.5)
    q = jnp.clip(mag, 0, maxq).astype(jnp.int32)
    sign = jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)
    return q, sign


def _select_topk_planes(planes, budget, keep_mode: str = "largest"):
    """Mask digit planes to ``budget`` terms per group.

    Args:
      planes: int32 (..., g, T) signed digits in {-1, 0, +1}; plane ``p``
        carries magnitude ``2**p``.
      budget: total number of terms to keep across the trailing (g, T) block.
      keep_mode: 'largest' keeps the budget largest-magnitude terms (the
        CUDA kernel's k-way merge, tr_cuda_kernel.cu:92-116); 'serial'
        keeps the FIRST budget terms in LSB-first serial order — the
        FPGA comparator/truncator's behaviour (concatenator_truncator.v:
        33-52: HESE emits low-order terms first on the wire and terms
        past the group budget are dropped).

    Returns:
      int32 (..., g, T) planes with dropped terms zeroed.
    """
    absd = jnp.abs(planes)  # (..., g, T) in {0, 1}
    cnt = jnp.sum(absd, axis=-2, keepdims=True)  # per-plane group count
    if keep_mode == "largest":
        # Terms in this group at strictly higher planes (any element).
        incl_from_top = jnp.cumsum(cnt[..., ::-1], axis=-1)[..., ::-1]
        before = incl_from_top - cnt  # sum over p' > p
    elif keep_mode == "serial":
        before = jnp.cumsum(cnt, axis=-1) - cnt  # sum over p' < p
    else:
        raise ValueError(f"unknown keep_mode {keep_mode!r}")
    # Same-plane tie-break: lowest element index first (strict > in the
    # reference merge, tr_cuda_kernel.cu:96-103; lane order in HW).
    within = jnp.cumsum(absd, axis=-2) - absd  # exclusive cumsum over g
    rank = before + within
    keep = (rank < budget) & (absd > 0)
    return jnp.where(keep, planes, 0)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "num_keep_terms", "axis",
                     "keep_mode"),
)
def term_reveal(
    x,
    sf,
    bits: int,
    group_size: int = 1,
    num_keep_terms: int = 8,
    axis: int = 1,
    keep_mode: str = "largest",
):
    """Fake-quantize ``x`` by group-wise top-alpha term revealing.

    Args:
      x: float array (any rank >= 1).
      sf: positive scale factor (scalar; may be a traced value — the MSE
        calibration search vmaps over it).
      bits: uniform-quantization bit width of the magnitude grid.
      group_size: elements per group along ``axis`` (consecutive).
      num_keep_terms: per-group term budget (= alpha * group_size).
      axis: grouping axis.  The reference always groups along dim 1
        (input channels of OIHW conv weights / rows' columns of OI linear
        weights); activations are flattened with group_size=1 so the axis
        is irrelevant there (``tr_layer.py:96-98``).

    Returns:
      Array like ``x`` holding the dequantized kept terms.
    """
    if group_size < 1:
        raise ValueError(f"group_size must be >= 1, got {group_size}")
    orig_shape = x.shape
    axis = axis % x.ndim

    x_moved = jnp.moveaxis(x, axis, -1)
    n = x_moved.shape[-1]
    pad = (-n) % group_size
    if pad:
        x_moved = jnp.pad(x_moved, [(0, 0)] * (x_moved.ndim - 1) + [(0, pad)])
    grouped = x_moved.reshape(x_moved.shape[:-1] + (-1, group_size))

    q, sign = uniform_quantize(grouped, sf, bits)
    planes = hese_digit_planes(q, bits)  # (..., G, g, T)
    kept = _select_topk_planes(planes, num_keep_terms, keep_mode)

    T = num_planes(bits)
    weights_pow2 = (1 << jnp.arange(T, dtype=jnp.int32))
    outq = jnp.sum(kept * weights_pow2, axis=-1)  # (..., G, g)
    out = sign * outq.astype(x.dtype) * sf

    out = out.reshape(x_moved.shape)
    if pad:
        out = out[..., :n]
    return jnp.moveaxis(out, -1, axis).reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("bits", "num_keep_terms"))
def term_reveal_elementwise(x, sf, bits: int, num_keep_terms: int):
    """Loop-free per-element term reveal (group_size == 1), fusion-friendly.

    Same semantics as ``term_reveal(x, sf, bits, 1, k)`` but expressed
    as pure element-wise int32 ops with NO digit-plane tensor and no
    Pallas call: HESE digits as two full-width bit masks, top-budget
    selection by clearing the ``popcount - budget`` lowest set bits of
    ``pos | neg`` (excess statically bounded by
    :func:`tq_tpu.kernels.tr_quantize.max_hese_terms`), reconstruction
    ``(pos & keep) - (neg & keep)`` read as integers.

    Use THIS inside larger jitted graphs (per-layer activation
    quantization): XLA fuses it into the neighbouring BN/ReLU/conv, so
    it costs no extra HBM round trip — unlike a standalone kernel call.
    The Pallas kernel remains the fastest *standalone* materialization.
    """
    from tq_tpu.kernels.tr_quantize import _popcount, _topk_value

    q, sign = uniform_quantize(x, sf, bits)
    acc = _topk_value(q, bits, num_keep_terms)
    return sign * acc.astype(x.dtype) * sf


@functools.partial(jax.jit, static_argnames=("bits", "num_keep_terms"))
def term_reveal_elementwise_int(x, sf, bits: int, num_keep_terms: int):
    """:func:`term_reveal_elementwise` without the dequantization.

    Returns the signed int32 quantized values (``+-q_kept``), for paths
    that feed integer MXU ops directly (int8 convs/matmuls); the caller
    applies ``* sf`` after the integer contraction.
    """
    from tq_tpu.kernels.tr_quantize import _topk_value

    q, _ = uniform_quantize(x, sf, bits)
    acc = _topk_value(q, bits, num_keep_terms)
    return jnp.where(x < 0, -acc, acc)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def term_reveal_st(x, sf, bits, group_size=1, num_keep_terms=8, axis=1):
    """:func:`term_reveal` with a straight-through estimator gradient.

    The reference framework is post-training-only; this variant adds
    quantization-aware training capability (d out / d x == identity,
    no gradient to ``sf``).
    """
    return term_reveal(x, sf, bits, group_size, num_keep_terms, axis)


def _st_fwd(x, sf, bits, group_size, num_keep_terms, axis):
    return term_reveal(x, sf, bits, group_size, num_keep_terms, axis), None


def _st_bwd(bits, group_size, num_keep_terms, axis, _res, g):
    return (g, jnp.zeros(()))


term_reveal_st.defvjp(_st_fwd, _st_bwd)
