"""Pallas TPU kernels for fused term-reveal fake quantization.

Semantics identical to :func:`tq_tpu.ops.term_reveal.term_reveal` (itself
the vectorized equivalent of the reference CUDA kernel
``kernels/tr_cuda_kernel.cu:59-125``); tested for bit-exact agreement.

Why a kernel when XLA already fuses element-wise chains: the jnp
formulation materializes a ``(..., T)`` digit-plane tensor (T = bits+1, a
10-17x memory blowup) around the cumulative sums, so on large activation
tensors the op becomes HBM-bound at many times the input size.  The Pallas
version keeps the plane loop *inside* the tile: one read of ``x``, one
write of ``y``, budget/accumulator registers in VMEM — i.e. speed of light
for a memory-bound elementwise op.

Two bodies:
  * group_size == 1 (the per-batch activation path, ``tr_layer.py:96-98``):
    per-element top-``budget`` term truncation; pure element-wise plane
    scan from the top magnitude down, carrying a per-element remaining
    budget.
  * group_size > 1 (the weight path): groups live on the sublane axis
    (host transposes to ``(g_pad, n_groups)``), so the per-plane group
    count is a sublane reduction and the tie-break rank is an exclusive
    sublane cumsum; the remaining-budget vector is carried top-down,
    making "rank < budget" equal to "within-plane rank < remaining".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tr_quantize"]

_LANE = 128
_INT = jnp.int32


def _digit_masks(q):
    """(pos_mask, neg_mask): bit p set iff the HESE digit at plane p is +1/-1.

    Full-width closed form of the automaton window (see
    ``tq_tpu.ops.hese.hese_digit_planes``): with bit-position-p views
    b_up = q>>1, b_cur = q, b_dn1 = q<<1, b_dn2 = q<<2,

        pos = (~b_up & b_cur & ~b_dn1) | (~b_cur & b_dn1 & b_dn2)
        neg = ( b_up & b_cur & ~b_dn1)

    computed ONCE per element (9 vector ops) instead of ~12 ops per
    plane — the plane loop then only extracts single bits.
    """
    up, dn1, dn2 = q >> 1, q << 1, q << 2
    no_dn1 = ~dn1
    pos = (~up & q & no_dn1) | (~q & dn1 & dn2)
    neg = up & q & no_dn1
    return pos, neg


def _digit_plane(q, p: int):
    """Signed HESE digit of int32 ``q`` at magnitude position ``p``."""
    pos, neg = _digit_masks(q)
    return ((pos >> p) & 1) - ((neg >> p) & 1)


def _quantize(x, sf, bits: int):
    maxq = float(2**bits - 1)
    q = jnp.minimum(jnp.floor(jnp.abs(x) / sf + 0.5), maxq).astype(_INT)
    sign = jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)
    return q, sign


def _popcount(v, width: int = 32):
    """SWAR popcount for non-negative values < 2**31 (digit masks span
    ``bits + 1`` planes, so 16-bit grids produce 17-bit masks).

    ``width``: static bound on the operand's bit width; narrower masks
    skip the upper folds (two fewer VPU ops per element for the <= 16
    bit masks every real grid produces)."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    if width > 8:
        v = v + (v >> 8)
    if width > 16:
        v = v + (v >> 16)
    return v & 0x3F


def max_hese_terms(bits: int) -> int:
    """Maximum automaton terms for a ``bits``-wide magnitude.

    The reference automaton is NOT canonical CSD: a run of length 2
    ('110') emits two terms in three bits (+2^(i+1) then -2^(i-1)...),
    so repeating '110' patterns reach 2 terms per 3 planes — denser
    than CSD's every-other-plane.  Exact maximum (verified exhaustively
    for bits <= 15 in tests): floor(2 * (bits + 1) / 3).
    """
    return 2 * (bits + 1) // 3


def _top_bit(r):
    """Mask of ``r``'s highest set bit; 0 for r == 0.  Exact for
    0 <= r < 2**24: the i32->f32 convert rounds to nearest but cannot
    bump past the value, so clearing the mantissa of float(r) yields
    exactly 2**floor(log2 r) (and 0.0 for 0) — 4 VPU ops, no popcount,
    no zero guard."""
    f = r.astype(jnp.float32)
    e = jax.lax.bitcast_convert_type(f, jnp.int32) & jnp.int32(-8388608)
    return jax.lax.bitcast_convert_type(e, jnp.float32).astype(_INT)


def _topk_value(q, bits: int, budget: int):
    """Integer value of ``q``'s ``budget`` largest HESE terms — loop-free.

    The automaton's term positions form a bit mask ``t`` with
    ``pos``/``neg`` disjoint, so the reconstructed value of any kept
    subset ``m`` is ``(pos & m) - (neg & m)`` read as integers
    == ``m - 2 * (m & neg)``.  Two statically-chosen strategies pick the
    kept mask (this is the hot ~8 ops/element of the whole framework —
    every activation element of every quantized layer runs it):

    * ``budget`` extractions of the top set bit via the f32-exponent
      trick (cheapest at small budgets — the reference's dt=2..4);
    * popcount + clear-lowest-bit chain + branch-free select
      (cheapest when ``max_hese_terms - budget`` is the smaller count).
    """
    if budget >= max_hese_terms(bits):
        # Degenerate (every reference UQ row: terms >= bits >= max
        # automaton terms): all terms kept, value == q.  Statically
        # skipping the mask/select math makes UQ-mode quantization a
        # plain ~10-op uniform quantize.
        return q
    # Term-position mask and the negative-term mask, directly:
    #   t   = (cur & ~dn1) | (~cur & dn1 & dn2)
    #   neg =  up & (cur & ~dn1);     pos = t ^ neg
    # (3 fewer ops than building pos/neg separately via _digit_masks).
    t, neg = _term_masks(q)
    n_extract = budget
    n_clear = max_hese_terms(bits) - budget
    if n_extract * 4 <= n_clear * 4 + 9:
        # Keep-side: peel the top bit `budget` times; the residual r is
        # the dropped low terms, so kept = t ^ r.  Zero-safe, no
        # popcount, no selects.
        r = t
        for _ in range(n_extract):
            r = r - _top_bit(r)
        kept = t ^ r
    else:
        # Drop-side: clear the (popcount - budget) lowest set bits.
        excess = _popcount(t, width=bits + 1) - budget
        kept = t
        u = t
        for i in range(1, n_clear + 1):
            u = u & (u - 1)
            kept = jnp.where(excess >= i, u, kept)
    return kept - ((kept & neg) << 1)


def _term_masks(q):
    """(t, neg): term-position mask and negative-term mask of ``q``."""
    dn1 = q << 1
    a = q & ~dn1
    t = a | (dn1 & (q << 2) & ~q)
    neg = (q >> 1) & a
    return t, neg


def _bottomk_value(q, bits: int, budget: int):
    """Integer value of ``q``'s ``budget`` LOWEST-magnitude HESE terms.

    The FPGA truncator's first-alpha-terms semantics
    (``concatenator_truncator.v:33-52``): the serial HESE encoder emits
    low-order terms first on the wire, so the hardware keeps the FIRST
    ``budget`` terms seen — the lowest planes — where the CUDA kernel
    keeps the largest.  Loop-free: peel the lowest set bit of the term
    mask ``budget`` times (``r & -r`` isolates it — 2 VPU ops per term,
    cheaper than the top-bit f32 trick); the kept mask is ``t ^ r``.
    """
    if budget >= max_hese_terms(bits):
        return q
    t, neg = _term_masks(q)
    r = t
    for _ in range(budget):
        r = r ^ (r & -r)
    kept = t ^ r
    return kept - ((kept & neg) << 1)


def _elementwise_body(sf_ref, x_ref, o_ref, *, bits: int, budget: int,
                      keep_mode: str = "largest"):
    """group_size == 1: keep ``budget`` HESE terms per element —
    'largest' = the CUDA kernel's magnitude order, 'serial' = the FPGA
    truncator's first-seen (lowest-plane) order."""
    sf = sf_ref[0]
    x = x_ref[:]
    q, sign = _quantize(x, sf, bits)
    select = _topk_value if keep_mode == "largest" else _bottomk_value
    acc = select(q, bits, budget)
    o_ref[:] = sign * acc.astype(x.dtype) * sf


def _grouped_body(sf_ref, x_ref, o_ref, *, bits: int, budget: int,
                  keep_mode: str = "largest"):
    """group_size > 1: block is (g_pad, TILE); groups on the sublane axis.

    ``keep_mode='serial'`` flips the plane loop direction (LSB plane
    first — the order the serial HESE encoder puts terms on the wire,
    ``concatenator_truncator.v:33-52``); the within-plane lane-order
    tie-break is the same in both modes.
    """
    sf = sf_ref[0]
    x = x_ref[:]
    g_pad = x.shape[0]
    q, sign = _quantize(x, sf, bits)
    pos, neg = _digit_masks(q)
    # Strictly-lower-triangular matrix: L @ a == exclusive sublane cumsum
    # (Mosaic has no cumsum lowering; this rides the MXU instead).
    row = jax.lax.broadcasted_iota(_INT, (g_pad, g_pad), 0)
    col = jax.lax.broadcasted_iota(_INT, (g_pad, g_pad), 1)
    ltri = (col < row).astype(jnp.float32)
    rem = jnp.full((1, x.shape[1]), budget, _INT)
    acc = jnp.zeros(x.shape, _INT)
    plane_order = (range(bits, -1, -1) if keep_mode == "largest"
                   else range(0, bits + 1))
    for p in plane_order:
        pm = (pos >> p) & 1
        nm = (neg >> p) & 1
        a = pm | nm
        within = jnp.dot(
            ltri, a.astype(jnp.float32), preferred_element_type=jnp.float32
        ).astype(_INT)  # exclusive rank inside the plane
        keep = (within < rem) & (a > 0)  # rem may go negative: then none kept
        acc = acc + jnp.where(keep, (pm - nm) << p, 0)
        rem = rem - jnp.sum(a, axis=0, keepdims=True)
    o_ref[:] = sign * acc.astype(x.dtype) * sf


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def tr_scale_copy(x, sf, interpret: bool | None = None):
    """Roofline comparator: the elementwise kernel's exact grid/BlockSpecs
    with a body that only scales the tile — the same-session copy
    ceiling the quantize kernel is measured against (bench.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sf_arr = jnp.asarray(sf, jnp.float32).reshape(1)
    flat = x.reshape(-1)
    n = flat.shape[0]
    cols = _LANE * 8
    rows_needed = -(-n // cols)
    tile_r = min(256, _pad_to(rows_needed, 8))
    padded_rows = _pad_to(rows_needed, tile_r)
    xp = jnp.pad(flat, (0, padded_rows * cols - n)).reshape(padded_rows, cols)

    def body(sf_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] * sf_ref[0]

    out = pl.pallas_call(
        body,
        grid=(padded_rows // tile_r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_r, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_rows, cols), x.dtype),
        interpret=interpret,
    )(sf_arr, xp)
    return out.reshape(-1)[:n].reshape(x.shape)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "num_keep_terms", "axis",
                     "keep_mode", "interpret"),
)
def tr_quantize(
    x,
    sf,
    bits: int,
    group_size: int = 1,
    num_keep_terms: int = 8,
    axis: int = 1,
    keep_mode: str = "largest",
    interpret: bool | None = None,
):
    """Pallas-accelerated term-reveal fake quantization.

    Drop-in equivalent of :func:`tq_tpu.ops.term_reveal.term_reveal`.
    ``sf`` is passed through SMEM, so calling with different scale factors
    does not recompile.  ``interpret=None`` auto-selects interpreter mode
    off-TPU (tests run the same kernel code on CPU).  ``keep_mode``:
    'largest' = the CUDA kernel's top-magnitude selection; 'serial' = the
    FPGA truncator's first-alpha-terms order (VERDICT r2 missing #4) —
    hardware-order experiments run at kernel speed in both modes.
    """
    if keep_mode not in ("largest", "serial"):
        raise ValueError(f"unknown keep_mode {keep_mode!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sf_arr = jnp.asarray(sf, jnp.float32).reshape(1)

    if group_size == 1:
        flat = x.reshape(-1)
        n = flat.shape[0]
        cols = _LANE * 8
        rows_needed = -(-n // cols)
        tile_r = min(256, _pad_to(rows_needed, 8))
        padded_rows = _pad_to(rows_needed, tile_r)
        xp = jnp.pad(flat, (0, padded_rows * cols - n)).reshape(padded_rows, cols)
        out = pl.pallas_call(
            functools.partial(
                _elementwise_body, bits=bits, budget=num_keep_terms,
                keep_mode=keep_mode,
            ),
            grid=(padded_rows // tile_r,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_r, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_r, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((padded_rows, cols), x.dtype),
            interpret=interpret,
        )(sf_arr, xp)
        return out.reshape(-1)[:n].reshape(x.shape)

    # Grouped path: move grouping axis last, split into (n_groups, g),
    # then put the group on the sublane axis as (g_pad, n_groups).
    orig_shape = x.shape
    axis = axis % x.ndim
    xm = jnp.moveaxis(x, axis, -1)
    n = xm.shape[-1]
    pad_n = _pad_to(n, group_size) - n
    if pad_n:
        xm = jnp.pad(xm, [(0, 0)] * (xm.ndim - 1) + [(0, pad_n)])
    grouped = xm.reshape(-1, group_size)  # (NG, g)
    ng = grouped.shape[0]
    g_pad = _pad_to(group_size, 8)
    tile = _LANE * 4
    ng_pad = _pad_to(ng, tile)
    gt = jnp.pad(grouped, ((0, ng_pad - ng), (0, g_pad - group_size))).T

    out = pl.pallas_call(
        functools.partial(_grouped_body, bits=bits, budget=num_keep_terms,
                          keep_mode=keep_mode),
        grid=(ng_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((g_pad, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g_pad, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g_pad, ng_pad), x.dtype),
        interpret=interpret,
    )(sf_arr, gt)

    res = out.T[:ng, :group_size].reshape(xm.shape)
    if pad_n:
        res = res[..., :n]
    return jnp.moveaxis(res, -1, axis).reshape(orig_shape)
