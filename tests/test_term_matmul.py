"""Fused term-matmul kernel vs the unfused reference composition."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tq_tpu.kernels.term_matmul import term_matmul
from tq_tpu.ops.term_reveal import term_reveal

_ON_TPU = jax.default_backend() == "tpu"


def _ref_close(out, ref, rtol, atol):
    """Compare a packed/integer path against an f32-weight reference.

    On CPU the f32 MXU is true f32 and the stated tolerances are
    (near-)exactness claims.  On the real chip fp32 MXU OPERANDS round
    to 8 mantissa bits (``--xla_allow_excess_precision``), so the f32
    REFERENCE side itself carries bf16 operand rounding while the
    packed integer side is exact — under ``TQ_TEST_TPU=1`` this asserts
    the bf16 rounding class instead; the exactness claims stay pinned
    by the default CPU run."""
    if _ON_TPU:
        # Operand-rounding error accumulates with the SUMMAND scale,
        # not the (possibly cancelled) output scale — scale atol by
        # the reference magnitude.
        scale = max(1.0, float(np.max(np.abs(np.asarray(ref)))))
        rtol, atol = max(rtol, 2e-2), max(atol, 2e-2 * scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=rtol, atol=atol)


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


def test_int_packed_weights_match(rng):
    """Integer-packed weight streaming path == fp weight path."""
    from tq_tpu.kernels.term_matmul import pack_weight_int
    from tq_tpu.layers.common import TRParams, quantize_weight

    x = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 64)) * 0.1, jnp.float32)
    for wb in (7, 9):
        tr = TRParams(wb, 8, 12, 8, 3)
        wq, w_sf = quantize_weight(w, tr, axis=0)
        ref = term_matmul(x, wq, jnp.float32(0.05), 8, 3, bm=64, bk=128, bn=64)
        wi, w_sf2 = pack_weight_int(wq, w_sf, wb)
        assert wi.dtype == (jnp.int8 if wb <= 7 else jnp.int16)
        out = term_matmul(x, wi, jnp.float32(0.05), 8, 3, w_sf=w_sf2,
                          bm=64, bk=128, bn=64)
        _ref_close(out, ref, rtol=1e-5, atol=1e-4)


def test_int8_bf16_packed_weights(rng):
    from tq_tpu.kernels.term_matmul import pack_weight_int
    from tq_tpu.layers.common import TRParams, quantize_weight

    x = jnp.asarray(rng.normal(size=(32, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 32)) * 0.1, jnp.float32)
    tr = TRParams(7, 8, 12, 8, 3)
    wq, w_sf = quantize_weight(w, tr, axis=0)
    wi, _ = pack_weight_int(wq, w_sf, 7)
    ref = term_matmul(x, wq, jnp.float32(0.05), 8, 3, bm=32, bk=128, bn=32)
    out = term_matmul(x, wi, jnp.float32(0.05), 8, 3, w_sf=w_sf, bf16=True,
                      bm=32, bk=128, bn=32)
    # int8 values are bf16-exact; xq bf16 rounding only.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_pack_and_kernel_validation(rng):
    """Review findings: overflow, zero-scale, dtype and w_sf contracts."""
    from tq_tpu.kernels import pack_weight_int

    w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    # Understating the grid must raise, not wrap.
    from tq_tpu.layers.common import TRParams, quantize_weight

    wq, w_sf = quantize_weight(w, TRParams(9, 8, 12, 8, 3), axis=0)
    with pytest.raises(ValueError, match="overflows"):
        pack_weight_int(wq, w_sf, 7)
    # All-zero weights pack without NaNs.
    wz, sfz = pack_weight_int(jnp.zeros((4, 4)), jnp.float32(0.0), 7)
    assert int(jnp.sum(jnp.abs(wz))) == 0 and float(sfz) == 1.0
    # Unsupported integer dtype rejected.
    x = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    with pytest.raises(ValueError, match="int8 or int16"):
        term_matmul(x, jnp.ones((16, 8), jnp.int32), 0.05,
                    w_sf=jnp.float32(1.0))
    # w_sf with float weights rejected (silent no-op before).
    with pytest.raises(ValueError, match="only meaningful"):
        term_matmul(x, jnp.ones((16, 8), jnp.float32), 0.05,
                    w_sf=jnp.float32(2.0))


def test_int8_mxu_mode_exact(rng):
    """int8 x int8 -> int32 serving path: EXACT integer accumulation."""
    from tq_tpu.kernels.term_matmul import pack_weight_int
    from tq_tpu.layers.common import TRParams, quantize_weight
    from tq_tpu.ops.term_reveal import uniform_quantize
    from tq_tpu.kernels.tr_quantize import _topk_value

    x = jnp.asarray(rng.normal(size=(48, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 40)) * 0.1, jnp.float32)
    sf = jnp.float32(0.05)
    bits, terms = 7, 3
    wq, w_sf = quantize_weight(w, TRParams(7, 8, 12, bits, terms), axis=0)
    wi, w_sf2 = pack_weight_int(wq, w_sf, 7)

    out = term_matmul(x, wi, sf, bits, terms, int8=True, w_sf=w_sf2,
                      bm=48, bk=128, bn=40)
    # Exact integer reference: signed quantized ints @ packed ints.
    q, sign = uniform_quantize(x, sf, bits)
    xq = np.asarray(sign * _topk_value(q, bits, terms).astype(jnp.float32),
                    np.int64)
    ref = (xq @ np.asarray(wi, np.int64)).astype(np.float64) \
        * float(sf) * float(w_sf2)
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               rtol=1e-6, atol=1e-6)


def test_int8_mode_validation(rng):
    from tq_tpu.kernels.term_matmul import pack_weight_int
    from tq_tpu.layers.common import TRParams, quantize_weight

    x = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 8)) * 0.1, jnp.float32)
    wq, w_sf = quantize_weight(w, TRParams(7, 8, 12, 7, 3), axis=0)
    wi, w_sf2 = pack_weight_int(wq, w_sf, 7)
    with pytest.raises(ValueError, match="bits <= 7"):
        term_matmul(x, wi, 0.05, 8, 3, int8=True, w_sf=w_sf2)
    with pytest.raises(ValueError, match="int8-packed"):
        term_matmul(x, wq, 0.05, 7, 3, int8=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        term_matmul(x, wi, 0.05, 7, 3, int8=True, bf16=True, w_sf=w_sf2)


def test_bf16_integer_operand_exact_vs_f32_weights(rng):
    """bf16 mode feeds integer activations: exact for <=8-bit grids when
    the weights are bf16-representable."""
    x = jnp.asarray(rng.normal(size=(32, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 32)) * 0.1,
                    jnp.bfloat16).astype(jnp.float32)  # bf16-exact weights
    sf = jnp.float32(0.05)
    ref = jnp.dot(term_reveal(x, sf, 8, 1, 3, axis=-1),
                  w, preferred_element_type=jnp.float32)
    out = term_matmul(x, w, sf, 8, 3, bf16=True, bm=32, bk=128, bn=32)
    _ref_close(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["f32", "bf16", "int8"])
def test_pipeline_matches_serial(rng, mode):
    """The in-block software-pipelined body (VPU quantize of sub-chunk s
    overlapped with the MXU MAC of sub-chunk s-1) computes the same
    MACs as the serialized body; the int8 path accumulates exactly in
    int32 so it is BIT-identical, the f32/bf16 paths differ only by
    f32 partial-sum grouping (VERDICT r2 weak #2)."""
    from tq_tpu.kernels.term_matmul import pack_weight_int
    from tq_tpu.layers.common import TRParams, quantize_weight

    x = jnp.asarray(rng.normal(size=(96, 640)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(640, 64)) * 0.1, jnp.float32)
    sf = jnp.float32(0.05)
    # bk=512 with the default bsub=256 -> 2 sub-chunks per k tile.
    kw = dict(bm=32, bk=512, bn=64)
    if mode == "f32":
        a = term_matmul(x, w, sf, 9, 3, pipeline=False, **kw)
        b = term_matmul(x, w, sf, 9, 3, pipeline=True, **kw)
    elif mode == "bf16":
        a = term_matmul(x, w, sf, 8, 3, bf16=True, pipeline=False, **kw)
        b = term_matmul(x, w, sf, 8, 3, bf16=True, pipeline=True, **kw)
    else:
        wq, w_sf = quantize_weight(w, TRParams(7, 8, 12, 7, 3), axis=0)
        wi, w_sf2 = pack_weight_int(wq, w_sf, 7)
        a = term_matmul(x, wi, sf, 7, 3, int8=True, w_sf=w_sf2,
                        pipeline=False, **kw)
        b = term_matmul(x, wi, sf, 7, 3, int8=True, w_sf=w_sf2,
                        pipeline=True, **kw)
    if mode == "int8":
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pack_dense_weights_serving(rng):
    """Packed dense serving: int8/int16 weights match the fp path."""
    from tq_tpu.layers.common import TRParams
    from tq_tpu.layers.linear import (init_quant_state, pack_dense_weights,
                                      tr_dense_apply, tr_dense_convert)

    x = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    for wb, db in ((7, 7), (9, 8)):  # int8-MXU path / int16 f32 path
        tr = TRParams(wb, 8, 12, db, 3)
        qp = tr_dense_convert(
            {"w": jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32),
             "b": jnp.zeros((32,), jnp.float32)}, tr)
        qs = init_quant_state()
        qs = {**qs, "sf": jnp.float32(0.05)}
        ref, _ = tr_dense_apply(qp, tr, qs, x, track=False)
        packed = pack_dense_weights(qp, tr)
        assert packed["w"].dtype == (jnp.int8 if wb <= 7 else jnp.int16)
        out, _ = tr_dense_apply(packed, tr, qs, x, track=False)
        _ref_close(out, ref, rtol=2e-4, atol=2e-4)
        # tracking phase works with packed weights (dequant fallback)
        y, qs2 = tr_dense_apply(packed, tr, qs, x, track=True)
        assert y.shape == ref.shape


def test_dense_apply_wide_n_bf16_path_exact(rng):
    """The wide-N (N >= 4K) integer-bf16 XLA path in tr_dense_apply is
    bit-exact vs the f32 reference composition for <= 8-bit grids
    (round-3 LSTM decoder fix; scripts/bench_lstm_decoder.py)."""
    from tq_tpu.layers.common import TRParams
    from tq_tpu.layers.linear import (
        init_quant_state,
        pack_dense_weights,
        tr_dense_apply,
        tr_dense_convert,
    )

    K, N, M = 32, 160, 8  # N >= 4K triggers the path
    tr = TRParams(8, 8, 24, 8, 8, quantize_input=True)
    params = {"w": jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32),
              "b": jnp.zeros((N,), jnp.float32)}
    qp = pack_dense_weights(tr_dense_convert(params, tr), tr)
    assert qp["w"].dtype == jnp.int16
    qs = {**init_quant_state(), "sf": jnp.float32(0.04)}
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    got, _ = tr_dense_apply(qp, tr, qs, x, track=False)
    xq = term_reveal(x, jnp.float32(0.04), 8, 1, 8, axis=-1)
    w_fp = qp["w"].astype(jnp.float32) * qp["w_sf"]
    want = jnp.dot(xq, w_fp) + params["b"]
    _ref_close(got, want, rtol=1e-6, atol=1e-6)


def test_int16_packed_bf16_fused_exact(rng):
    """int16-packed 8-bit-grid weights through the FUSED kernel's bf16
    mode: integer operands <= 256 are bf16-exact, so the result matches
    the f32 composition exactly (up to f32 partial-sum rounding)."""
    from tq_tpu.kernels.term_matmul import pack_weight_int

    K, N, M = 128, 64, 32
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    sf = jnp.float32(0.04)
    w_q = term_reveal(w.T, jnp.float32(0.002), 8, 8, 24).T
    w16, w_sf = pack_weight_int(w_q, jnp.float32(0.002), 8)
    assert w16.dtype == jnp.int16
    out = term_matmul(x, w16, sf, 8, 8, bf16=True, w_sf=w_sf,
                      bm=32, bk=128, bn=64)
    ref = jnp.dot(term_reveal(x, sf, 8, 1, 8, axis=-1), w_q)
    _ref_close(out, ref, rtol=1e-6, atol=1e-5)


def test_bm_equal_split_no_padding_waste(rng):
    """M values that don't divide the default bm still compute exactly
    (the equal-split bm heuristic; M=2240 is the LSTM decoder's T*B)."""
    M, K, N = 2240 // 10, 64, 32  # same non-divisibility class, small
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32)
    sf = jnp.float32(0.03)
    ref = jnp.dot(term_reveal(x, sf, 8, 1, 3, axis=-1), w)
    out = term_matmul(x, w, sf, 8, 3, bm=64, bk=64, bn=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_packed_u8s_weights_match_int16_path(rng):
    """PackedWeight8 (9 bits/weight) must reproduce the int16-packed
    bf16 path bit-for-bit: same integer operands after decode, same
    tiling, same accumulation order."""
    from tq_tpu.kernels.term_matmul import (
        PackedWeight8, pack_weight_int, pack_weight_u8s)

    K, N, M = 128, 64, 32
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    sf = jnp.float32(0.04)
    w_q = term_reveal(w.T, jnp.float32(0.002), 8, 8, 24).T
    w16, w_sf16 = pack_weight_int(w_q, jnp.float32(0.002), 8)
    wp = pack_weight_u8s(w_q, jnp.float32(0.002), 8)
    assert isinstance(wp, PackedWeight8)
    assert wp.lo.dtype == jnp.int8 and wp.signs.dtype == jnp.int8
    assert wp.lo.shape == (K, N) and wp.signs.shape == (K // 8, N)
    ref = term_matmul(x, w16, sf, 8, 8, bf16=True, w_sf=w_sf16,
                      bm=32, bk=128, bn=64)
    out = term_matmul(x, wp, sf, 8, 8, bf16=True, bm=32, bk=128, bn=64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # f32 MXU mode works too.
    out32 = term_matmul(x, wp, sf, 8, 8, bm=32, bk=128, bn=64)
    refq = jnp.dot(term_reveal(x, sf, 8, 1, 8, axis=-1), w_q)
    _ref_close(out32, refq, rtol=1e-6, atol=1e-5)


def test_packed_u8s_odd_k_and_full_range(rng):
    """K not divisible by 8 (the LSTM decoder's K=650 class) pads
    soundly, and magnitudes spanning the full 0..255 clamp range
    round-trip through the biased encoding."""
    from tq_tpu.kernels.term_matmul import pack_weight_u8s

    K, N, M = 130, 32, 16
    q = rng.integers(-255, 256, size=(K, N)).astype(np.float32)
    w_sf = jnp.float32(0.01)
    w_q = jnp.asarray(q) * w_sf
    wp = pack_weight_u8s(w_q, w_sf, 8)
    assert wp.lo.shape == (136, N)  # padded to a multiple of 8
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    sf = jnp.float32(0.03)
    out = term_matmul(x, wp, sf, 8, 3, bf16=True, bm=16, bk=128, bn=32)
    ref = jnp.dot(term_reveal(x, sf, 8, 1, 3, axis=-1), w_q)
    _ref_close(out, ref, rtol=1e-5, atol=1e-4)


def test_packed_u8s_validation(rng):
    from tq_tpu.kernels.term_matmul import pack_weight_u8s

    w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    with pytest.raises(ValueError, match="bits <= 8"):
        pack_weight_u8s(w, jnp.float32(0.01), 9)
    with pytest.raises(ValueError, match="understates"):
        pack_weight_u8s(w * 100, jnp.float32(0.01), 8)
    # All-zero weights pack cleanly.
    wz = pack_weight_u8s(jnp.zeros((16, 8)), jnp.float32(0.0), 8)
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    out = term_matmul(x, wz, jnp.float32(0.05), 8, 3, bf16=True,
                      bm=8, bk=128, bn=8)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    wp = pack_weight_u8s(w * 0.01, jnp.float32(0.01), 8)
    with pytest.raises(ValueError, match="carries its own"):
        term_matmul(x, wp, jnp.float32(0.05), 8, 3, w_sf=jnp.float32(1.0))
    with pytest.raises(ValueError, match="int8 mode"):
        term_matmul(x, wp, jnp.float32(0.05), 7, 3, int8=True)


def test_pack_dense_weights_u8s_serving(rng):
    """fmt='u8s' dense serving: the 9-bit packed decoder path matches
    the fp path through every phase (fused, tracking fallback, 3-D
    fallback)."""
    from tq_tpu.kernels.term_matmul import PackedWeight8
    from tq_tpu.layers.common import TRParams
    from tq_tpu.layers.linear import (init_quant_state, pack_dense_weights,
                                      tr_dense_apply, tr_dense_convert)

    tr = TRParams(8, 8, 12, 8, 3)
    K, N = 72, 32  # K not a multiple of 8: exercises the pad path
    qp = tr_dense_convert(
        {"w": jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32),
         "b": jnp.asarray(rng.normal(size=(N,)), jnp.float32)}, tr)
    qs = {**init_quant_state(), "sf": jnp.float32(0.05)}
    x = jnp.asarray(rng.normal(size=(16, K)), jnp.float32)
    ref, _ = tr_dense_apply(qp, tr, qs, x, track=False)
    packed = pack_dense_weights(qp, tr, fmt="u8s")
    assert isinstance(packed["w"], PackedWeight8)
    out, _ = tr_dense_apply(packed, tr, qs, x, track=False)
    _ref_close(out, ref, rtol=2e-4, atol=2e-4)
    # tracking phase (raw-x matmul through the decode fallback)
    y, _ = tr_dense_apply(packed, tr, qs, x, track=True)
    yr, _ = tr_dense_apply(qp, tr, qs, x, track=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    # 3-D input takes the unfused decode fallback
    x3 = x.reshape(4, 4, K)
    out3, _ = tr_dense_apply(packed, tr, qs, x3, track=False)
    _ref_close(np.asarray(out3).reshape(16, N), ref,
               rtol=2e-4, atol=2e-4)
    with pytest.raises(ValueError, match="unknown pack fmt"):
        pack_dense_weights(qp, tr, fmt="nope")


def test_lstm_pack_u8s_generation_path(rng):
    """lstm_lm.pack(fmt='u8s'): quantized forward with the 9-bit packed
    decoder matches the int16-packed forward."""
    import jax

    from tq_tpu.models import lstm_lm

    vocab, em, hid = 50, 16, 16
    params = lstm_lm.init(jax.random.PRNGKey(0), vocab=vocab, emsize=em,
                          nhid=hid, nlayers=2)
    qparams, qcfg, qstate = lstm_lm.convert(params, 8, 8, 24, 8, 8)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    tokens = jnp.asarray(rng.integers(0, vocab, size=(5, 3)), jnp.int32)
    hidden = lstm_lm.init_hidden(3, nhid=hid, nlayers=2)
    fwd = lstm_lm.make_quantized_apply(qcfg, track=False)
    p16 = lstm_lm.pack(qparams, qcfg)
    pu8 = lstm_lm.pack(qparams, qcfg, fmt="u8s")
    ref, _, _ = fwd(p16, qstate, tokens, hidden)
    out, _, _ = fwd(pu8, qstate, tokens, hidden)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_model_pack_single_host_sync(monkeypatch, rng):
    """Model-level pack must batch ALL overflow checks into ONE
    jax.device_get (BENCH_r04 post-mortem: per-tensor float() syncs
    under a congested device tunnel cost minutes; PERF.md round 5)."""
    import jax

    from tq_tpu.models import transformer_lm

    params = transformer_lm.init(jax.random.PRNGKey(0), vocab=64,
                                 emsize=16, nhead=2, nhid=16, nlayers=2)
    qp, qcfg, qs = transformer_lm.convert(params, 8, 8, 24, 8, 8)

    calls = []
    real = jax.device_get
    monkeypatch.setattr(jax, "device_get", lambda x: calls.append(1) or real(x))
    transformer_lm.pack(qp, qcfg, fmt="u8s")
    assert len(calls) == 1, f"pack made {len(calls)} host syncs, want 1"
