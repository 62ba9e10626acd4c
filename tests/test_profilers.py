"""Efficiency-model parity: exact reproduction of published tmacs numbers.

The reference's committed results JSONs are deterministic arithmetic over
layer shapes, so these tests pin exact equality (BASELINE.md anchors).
"""

import numpy as np
import pytest

from tq_tpu.layers.common import TRParams
from tq_tpu.profilers import (
    LayerCost,
    compressed_hese_bits,
    dense_term_macs,
    model_cost,
)

MLP_LAYERS = [  # MNISTMLP: 784-512-512-10 (train_mlp.py:10-26), batch 1
    LayerCost("dense", "fc1", 512, 784, weight_numel=784 * 512),
    LayerCost("dense", "fc2", 512, 512, weight_numel=512 * 512),
    LayerCost("dense", "fc3", 10, 512, weight_numel=512 * 10),
]


@pytest.mark.parametrize(
    "wb,expected_tmacs,expected_bits",
    [  # results/mnist-quant.json: wb=wt in 2..6, db=dt=6, g=1
        (2, 8024064, 1337344),
        (3, 12036096, 2006016),
        (4, 16048128, 2674688),
        (5, 20060160, 3343360),
        (6, 24072192, 4012032),
    ],
)
def test_mnist_uq_tmacs_exact(wb, expected_tmacs, expected_bits):
    tr = TRParams(weight_bits=wb, group_size=1, weight_terms=wb,
                  data_bits=6, data_terms=6)
    tmacs, pbits = model_cost([(lc, tr) for lc in MLP_LAYERS])
    assert tmacs == expected_tmacs
    assert pbits == expected_bits


@pytest.mark.parametrize(
    "wt,expected_tmacs",
    [  # results/mnist-tr.json: wb=4, g=16, wt in {6,8,10,12,14}, dt=6
        (6, 1504512),
        (8, 2006016),
        (10, 2507520),
        (12, 3009024),
        (14, 3510528),
    ],
)
def test_mnist_tr_tmacs_exact(wt, expected_tmacs):
    tr = TRParams(weight_bits=4, group_size=16, weight_terms=wt,
                  data_bits=6, data_terms=6)
    tmacs, _ = model_cost([(lc, tr) for lc in MLP_LAYERS])
    assert tmacs == expected_tmacs


@pytest.mark.parametrize(
    "wb,expected",
    [  # results/lstm-quant.json tmacs; decoder-dense only (35x10 batch,
        # 33278 vocab, 650 hidden) — tr_lstm_ops is a no-op in the
        # reference (profile_model.py:48-49).
        (5, 302829800000),
        (6, 363395760000),
        (7, 423961720000),
        (8, 484527680000),
        (9, 545093640000),
    ],
)
def test_lstm_uq_tmacs_exact(wb, expected):
    tr = TRParams(weight_bits=wb, group_size=1, weight_terms=wb,
                  data_bits=8, data_terms=8)
    got = dense_term_macs(out_elems=35 * 10 * 33278, in_features=650, tr=tr)
    assert got == expected


@pytest.mark.parametrize(
    "wt,expected",
    [  # results/lstm-tr.json tmacs: wb=8, g=8, dt=8
        (8, 60565960000),
        (12, 90848940000),
        (16, 121131920000),
        (20, 151414900000),
        (24, 181697880000),
    ],
)
def test_lstm_tr_tmacs_exact(wt, expected):
    tr = TRParams(weight_bits=8, group_size=8, weight_terms=wt,
                  data_bits=8, data_terms=8)
    got = dense_term_macs(out_elems=35 * 10 * 33278, in_features=650, tr=tr)
    assert got == expected


def test_conv_exclusion_rules():
    tr = TRParams(9, 1, 9, 9, 9)
    first = LayerCost("conv", "conv1", 64 * 112 * 112, 3, 7, 7)
    depthwise = LayerCost("conv", "dw", 32 * 56 * 56, 32, 3, 3, groups=32)
    normal = LayerCost("conv", "c", 64 * 56 * 56, 64, 3, 3)
    tmacs, _ = model_cost([(first, tr), (depthwise, tr), (normal, tr)])
    assert tmacs == 81 * (64 * 56 * 56) * 64 * 9  # only the normal conv


def test_compressed_hese_bits_matches_scalar_reference(rng):
    """Vectorized bit counter == per-value automaton count * per-term cost."""
    from tq_tpu.ops.oracle import hese_encode_oracle

    w_sf = 0.01
    wq = (rng.integers(-255, 256, size=(64,)) * w_sf).astype(np.float32)
    got = compressed_hese_bits(wq, w_sf, weight_terms=16, weight_bits=9)
    per_term = 4 + 2  # ceil(log2(weight_bits=9)) + sign + barrier
    want = per_term * sum(
        len(hese_encode_oracle(float(v), w_sf, 10)) for v in wq
    )
    assert got == want


# ---------------------------------------------------------------------------
# Trace-derived spec tables (VERDICT r2 missing #3): one eval_shape trace of
# model.apply must reproduce every hand-written conv/dense spec table exactly
# — the JAX-native analog of the reference's hook-based profiling of arbitrary
# module trees (thop/profile.py:59-128).
# ---------------------------------------------------------------------------

import jax.numpy as jnp  # noqa: E402

from tq_tpu.models import alexnet, efficientnet, mobilenet, resnet, vgg  # noqa: E402
from tq_tpu.profilers.trace_specs import (  # noqa: E402
    jaxpr_conv_specs,
    specs_for,
    trace_conv_specs,
    trace_dense_specs,
)

CNN_ZOO = [alexnet, efficientnet, mobilenet, resnet, vgg]


@pytest.mark.parametrize("model_mod", CNN_ZOO,
                         ids=lambda m: m.__name__.rsplit(".", 1)[-1])
def test_traced_conv_specs_match_hand_tables(model_mod):
    assert trace_conv_specs(model_mod) == model_mod.conv_specs()


@pytest.mark.parametrize("model_mod", CNN_ZOO,
                         ids=lambda m: m.__name__.rsplit(".", 1)[-1])
def test_traced_dense_specs_match_hand_tables(model_mod):
    assert trace_dense_specs(model_mod) == model_mod.dense_specs()


def test_jaxpr_specs_any_callable():
    """The generic jaxpr walk recovers the same shapes with no protocol."""
    import jax

    params = jax.eval_shape(resnet.init, jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    convs, denses = jaxpr_conv_specs(
        lambda p, xx: resnet.apply(p, xx), params, x)
    hand = resnet.conv_specs()
    assert len(convs) == len(hand)
    for got, want in zip(convs, hand):
        assert (got.in_ch, got.out_ch, got.kh, got.kw, got.stride,
                got.groups, got.out_h, got.out_w) == (
            want.in_ch, want.out_ch, want.kh, want.kw, want.stride,
            want.groups, want.out_h, want.out_w)
    assert [(d[1], d[2]) for d in denses] == [(512, resnet.NUM_CLASSES)]


def test_specs_for_falls_back_to_trace():
    """A model module with no hand table still gets specs (and so cost)."""
    import types

    bare = types.ModuleType("bare_resnet")
    bare.init = resnet.init
    bare.apply = resnet.apply
    specs = specs_for(bare)
    assert specs == resnet.conv_specs()

    from tq_tpu.convert.policy import static_conv_layer_settings
    from tq_tpu.profilers import cnn_cost

    settings = static_conv_layer_settings(specs, 9, 8, 12)
    tmacs, avg_terms = cnn_cost(specs, settings, 9, 3)
    assert tmacs > 0 and avg_terms > 0
