"""Tensor-parallel term-matmul vs single-device reference (8-dev mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tq_tpu.kernels.term_matmul import term_matmul
from tq_tpu.parallel.mesh import make_mesh

# SPMD tests need the virtual multi-device mesh; under TQ_TEST_TPU=1
# the suite runs on ONE real chip, where these are meaningless (the
# sharding semantics are identical on the virtual CPU mesh — conftest).
pytestmark = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs >= 8 devices (virtual CPU mesh; TQ_TEST_TPU runs on one chip)")
from tq_tpu.parallel.tp import tp_term_matmul_col, tp_term_matmul_row


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=2, n_model=4)


@pytest.fixture(scope="module")
def operands():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.1, jnp.float32)
    return x, w


def test_column_parallel_matches(mesh, operands):
    x, w = operands
    sf = jnp.float32(0.04)
    ref = term_matmul(x, w, sf, 8, 3)
    out = tp_term_matmul_col(x, w, sf, 8, 3, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_row_parallel_matches(mesh, operands):
    x, w = operands
    sf = jnp.float32(0.04)
    ref = term_matmul(x, w, sf, 8, 3)
    out = tp_term_matmul_row(x, w, sf, 8, 3, mesh)
    # psum reassociates the K-dim sum; fp tolerance only.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_overlap_collective_matmul_matches(mesh, operands):
    """Ring all-gather-overlap matmul == single-device result.

    NB the block each step multiplies is device (me+step)%n's x K-block
    against the same rows of the local W columns — sum over steps covers
    every K-block exactly once.
    """
    from tq_tpu.parallel.tp import tp_term_matmul_overlap

    x, w = operands
    sf = jnp.float32(0.04)
    ref = term_matmul(x, w, sf, 8, 3)
    out = tp_term_matmul_overlap(x, w, sf, 8, 3, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_column_parallel_under_jit(mesh, operands):
    x, w = operands
    sf = jnp.float32(0.04)
    f = jax.jit(lambda x, w, sf: tp_term_matmul_col(x, w, sf, 8, 3, mesh))
    out = f(x, w, sf)
    ref = term_matmul(x, w, sf, 8, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_tp_int8_packed_all_layouts(mesh):
    """int8-packed weights through every TP layout == unsharded int8."""
    import numpy as np
    import jax.numpy as jnp

    from tq_tpu.kernels.term_matmul import pack_weight_int, term_matmul
    from tq_tpu.layers.common import TRParams, quantize_weight
    from tq_tpu.parallel.tp import (tp_term_matmul_col,
                                    tp_term_matmul_overlap,
                                    tp_term_matmul_row)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    sf = jnp.float32(0.05)
    wq, w_sf = quantize_weight(w, TRParams(7, 8, 12, 7, 3), axis=0)
    wi, w_sf2 = pack_weight_int(wq, w_sf, 7)
    ref = term_matmul(x, wi, sf, 7, 3, int8=True, w_sf=w_sf2)
    for fn in (tp_term_matmul_col, tp_term_matmul_overlap,
               tp_term_matmul_row):
        out = fn(x, wi, sf, 7, 3, mesh, w_sf=w_sf2, int8=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=fn.__name__)


def test_column_parallel_packed_matches(mesh):
    """Column-parallel 9-bit packed decoder: sharded packed streams
    reproduce the single-device packed matmul (both quantized-x and the
    raw-input quantize_x=False serving mode)."""
    from tq_tpu.kernels.term_matmul import pack_weight_u8s
    from tq_tpu.ops.term_reveal import term_reveal
    from tq_tpu.parallel.tp import tp_term_matmul_col_packed

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 128)) * 0.05, jnp.float32)
    w_q = term_reveal(w.T, jnp.float32(0.002), 8, 8, 24).T
    wp = pack_weight_u8s(w_q, jnp.float32(0.002), 8)
    sf = jnp.float32(0.04)

    ref = term_matmul(x, wp, sf, 8, 3, bf16=True)
    out = tp_term_matmul_col_packed(x, wp, sf, 8, 3, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    ref_raw = term_matmul(x, wp, jnp.float32(1.0), 8, 3, quantize_x=False)
    out_raw = tp_term_matmul_col_packed(x, wp, jnp.float32(1.0), 8, 3,
                                        mesh, bf16=False, quantize_x=False)
    np.testing.assert_allclose(np.asarray(out_raw), np.asarray(ref_raw),
                               rtol=1e-5, atol=1e-5)


def test_transformer_tp_packed_decoder_matches(mesh):
    """Model-level Transformer TP serving: packed decoder sharded over
    'model' reproduces the single-device quantized forward (VERDICT r3
    next #8 — the Transformer mirror of the LSTM packed-decoder TP)."""
    import jax

    from tq_tpu.models import transformer_lm

    p = transformer_lm.init(jax.random.PRNGKey(0), vocab=64, emsize=16,
                            nhead=2, nhid=16, nlayers=1)
    qp, qcfg, qs = transformer_lm.convert(p, 8, 8, 24, 8, 8)
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    qp = transformer_lm.pack(qp, qcfg, fmt="u8s")
    toks = jnp.asarray(
        np.random.default_rng(3).integers(0, 64, (7, 2)), jnp.int32)

    ref, _ = transformer_lm.make_quantized_apply(qcfg, track=False)(
        qp, qs, toks)
    tp_fwd = transformer_lm.make_tp_quantized_apply(qcfg, mesh)
    out, _ = tp_fwd(qp, qs, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_transformer_tp_requires_packed(mesh):
    import jax

    from tq_tpu.models import transformer_lm

    p = transformer_lm.init(jax.random.PRNGKey(0), vocab=64, emsize=16,
                            nhead=2, nhid=16, nlayers=1)
    qp, qcfg, qs = transformer_lm.convert(p, 8, 8, 24, 8, 8)
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    toks = jnp.zeros((3, 1), jnp.int32)
    with pytest.raises(TypeError, match="u8s-packed"):
        transformer_lm.make_tp_quantized_apply(qcfg, mesh)(qp, qs, toks)
