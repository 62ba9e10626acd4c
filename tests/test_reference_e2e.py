"""Reference-in-the-loop parity: the reference's own torch pipeline
(with tr_cuda swapped for the native oracle — see reference_harness.py)
versus tq_tpu, on identical weights and identical inputs.

This converts every "protocol reproduced" claim in PARITY.md into
executable proof: if any calibration constant, rounding rule, histogram
edge case, or conversion policy drifts, these tests fail.

Covered pipelines:
  * evaluate_mlp.py:73-87 accuracy pipeline (UQ and TR settings) —
    conversion, two-phase calibrate/eval, TRLinearLayer (including its
    dropped input quantization);
  * one TRConv2dLayer block (tr_layer.py:106-132) with real input
    quantization: histogram bit-parity, MSE scale-search parity, and
    bit-exact phase-2 quantization given the same scale;
  * TRLSTMLayer (tr_layer.py:162-201): layer-0-only weight TR, the
    shared emb/h/c quantizer, and the two-phase protocol.

Scale-factor comparisons allow one part in ~1e6: torch.linspace and
jnp.linspace build the 2048-candidate grid with different vectorized
rounding (measured max 4e-6 absolute on [1e-8, 50]), so the chosen
scales agree to grid-ulp, not bit-for-bit.  Everything downstream of a
*given* scale is asserted bit-exactly.
"""

from __future__ import annotations

import sys
from copy import deepcopy
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax.numpy as jnp

from reference_harness import FixedLoader, load_reference, torch_mlp_from_npz

pytestmark = [
    pytest.mark.skipif(
        not Path("/root/reference").is_dir(),
        reason="reference checkout absent",
    ),
    pytest.mark.slow,  # heavyweight tier (make test-fast deselects)
]

CKPT = str(Path(__file__).resolve().parents[1] / "pretrained/mnist_mlp.npz")


def _synthetic_test_set(n=2048, seed=7):
    from tq_tpu.data.synthetic import synthetic_mnist

    (_, _), (x, y) = synthetic_mnist(num_train=1, num_test=n, seed=seed)
    return x[:n], y[:n]


def _sf_close(a, b):
    return abs(float(a) - float(b)) <= 5e-6 * max(abs(float(b)), 1e-3)


@pytest.mark.parametrize(
    "wb,wt,db,dt,gs",
    [(4, 4, 6, 6, 1),   # a UQ row of evaluate_mlp.sh:3
     (4, 10, 6, 6, 16)],  # a TR row of evaluate_mlp.sh:4
)
def test_mlp_pipeline_parity(wb, wt, db, dt, gs):
    """evaluate_mlp.py:73-87 vs tq_tpu.evals.mlp on identical data."""
    ref = load_reference()
    model, params = torch_mlp_from_npz(CKPT)
    x, y = _synthetic_test_set()
    device = torch.device("cpu")
    loader = FixedLoader(x.reshape(len(y), -1), y, batch_size=128)

    # --- reference pipeline (its own functions, as committed) ---
    qmodel = deepcopy(model)
    tr_params = ref.evaluate_mlp.static_linear_layer_settings(qmodel, wb, gs, wt)
    qmodel = ref.evaluate_mlp.replace_linear_layers(qmodel, tr_params, db, dt)
    ref.train_mlp.test(None, qmodel, device, loader, pct=0.05)
    ref.tr_layer.set_tr_tracking(qmodel, False)
    acc_ref = ref.train_mlp.test(None, qmodel, device, loader)

    # --- tq_tpu pipeline ---
    from tq_tpu.evals.mlp import evaluate_setting
    from tq_tpu.models import mlp

    acc_ours, _, _ = evaluate_setting(
        params, wb, wt, db, dt, gs, x_test=x, y_test=y, batch_size=128,
        quantize_input=False, shuffle_seed=None,
    )
    assert round(acc_ours * len(y) / 100) == round(acc_ref * len(y)), (
        f"accuracy mismatch: ours {acc_ours:.4f}% vs reference "
        f"{100 * acc_ref:.4f}%"
    )

    # --- tensor-level parity ---
    settings = mlp.static_layer_settings(wb, gs, wt)
    qparams, qcfg, qstate = mlp.convert(
        params, settings, db, dt, quantize_input=False
    )
    # term-revealed weights must be bit-exact
    for i, name in zip((0, 3, 6), mlp.LAYER_NAMES):
        w_ref = qmodel.features[i].linear.weight.detach().numpy()
        w_ours = np.asarray(qparams[name]["w"]).T
        assert np.array_equal(w_ref, w_ours), f"{name} weights differ"
    # calibrated scale factors agree to grid-ulp
    track_fwd = mlp.make_quantized_apply(qcfg, track=True)
    n_calib, seen = round(0.05 * len(y)), 0
    for i in range(0, len(y), 128):
        _, qstate = track_fwd(qparams, qstate, jnp.asarray(x[i : i + 128]))
        seen += len(y[i : i + 128])
        if seen >= n_calib:
            break
    qstate = mlp.finalize(qstate, qcfg)
    for i, name in zip((0, 3, 6), mlp.LAYER_NAMES):
        sf_ref = qmodel.features[i].input_quant.sf
        assert _sf_close(qstate[name]["sf"], sf_ref), (
            name, float(qstate[name]["sf"]), sf_ref)
    # logits on one batch
    eval_fwd = mlp.make_quantized_apply(qcfg, track=False)
    with torch.no_grad():
        logp_ref = qmodel(torch.from_numpy(x[:128].reshape(128, -1))).numpy()
    logp_ours, _ = eval_fwd(qparams, qstate, jnp.asarray(x[:128]))
    np.testing.assert_allclose(np.asarray(logp_ours), logp_ref, atol=1e-4)
    assert np.array_equal(
        np.argmax(np.asarray(logp_ours), -1), np.argmax(logp_ref, -1)
    )


def test_conv_block_parity():
    """One TRConv2dLayer (tr_layer.py:106-132) vs tr_conv_apply,
    with real input quantization exercised end to end."""
    ref = load_reference()
    from tq_tpu.layers.common import TRParams
    from tq_tpu.layers.conv import tr_conv_apply, tr_conv_convert
    from tq_tpu.layers.linear import finalize_quant_state, init_quant_state
    from tq_tpu.layers.quantize import act_quantize

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(16, 32, 3, padding=1)
    w_orig = conv.weight.detach().numpy().copy()  # OIHW
    b_orig = conv.bias.detach().numpy().copy()
    layer = ref.tr_layer.TRConv2dLayer(
        conv, data_bits=8, data_terms=3, weight_bits=8, group_size=8,
        num_terms=12,
    )

    rng = np.random.default_rng(3)
    batches = [rng.normal(0, 2.0, (4, 16, 8, 8)).astype(np.float32)
               for _ in range(3)]

    with torch.no_grad():
        for xb in batches[:2]:  # phase 1: tracking
            layer(torch.from_numpy(xb))
    layer.tracking(False)  # finish_tracking -> mse_profile
    with torch.no_grad():
        y_ref = layer(torch.from_numpy(batches[2])).numpy()
    sf_ref = layer.input_quant.sf

    # --- ours ---
    tr = TRParams(weight_bits=8, group_size=8, weight_terms=12,
                  data_bits=8, data_terms=3, quantize_input=True)
    qp = tr_conv_convert(
        {"w": jnp.asarray(np.transpose(w_orig, (2, 3, 1, 0))),
         "b": jnp.asarray(b_orig)}, tr,
    )
    # converted weights bit-exact vs the reference layer's
    assert np.array_equal(
        np.transpose(np.asarray(qp["w"]), (3, 2, 0, 1)),
        layer.conv.weight.detach().numpy(),
    )
    qs = init_quant_state()
    pad = [(1, 1), (1, 1)]
    for xb in batches[:2]:
        _, qs = tr_conv_apply(qp, tr, qs, jnp.asarray(np.transpose(xb, (0, 2, 3, 1))),
                              track=True, padding=pad)
    # histogram bit-parity with torch.histc accumulation
    assert np.array_equal(
        np.asarray(qs["hist"]), layer.input_quant.hist_bins.numpy()
    )
    qs = finalize_quant_state(qs, tr.data_bits, tr.data_terms)
    assert _sf_close(qs["sf"], sf_ref), (float(qs["sf"]), sf_ref)

    # phase-2 quantization is bit-exact GIVEN the same scale
    x3 = batches[2]
    xq_ref = ref.tr_cuda.tr(
        torch.from_numpy(x3).reshape(1, -1, 1, 1), sf_ref, 8, 1, 3
    ).numpy().reshape(x3.shape)
    xq_ours = np.asarray(act_quantize(jnp.asarray(x3), jnp.float32(sf_ref), 8, 3))
    assert np.array_equal(xq_ref, xq_ours)

    # full block output with our own calibrated scale
    y_ours, _ = tr_conv_apply(
        qp, tr, qs, jnp.asarray(np.transpose(x3, (0, 2, 3, 1))),
        track=False, padding=pad,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(y_ours), (0, 3, 1, 2)), y_ref, atol=2e-4
    )


def test_lstm_layer_parity():
    """TRLSTMLayer (tr_layer.py:162-201) vs tr_lstm_apply: layer-0-only
    weight TR, one shared emb/h/c quantizer, two-phase protocol."""
    ref = load_reference()
    from tq_tpu.layers.common import TRParams
    from tq_tpu.layers.linear import finalize_quant_state, init_quant_state
    from tq_tpu.layers.lstm import tr_lstm_apply, tr_lstm_convert

    torch.manual_seed(1)
    lstm = torch.nn.LSTM(32, 32, num_layers=2)
    orig = {k: v.detach().numpy().copy() for k, v in lstm.named_parameters()}
    layer = ref.tr_layer.TRLSTMLayer(
        lstm, data_bits=8, data_terms=3, weight_bits=8, group_size=8,
        num_terms=24,
    )

    rng = np.random.default_rng(5)
    T, B, H = 6, 4, 32
    emb1 = rng.normal(0, 1.5, (T, B, H)).astype(np.float32)
    emb2 = rng.normal(0, 1.5, (T, B, H)).astype(np.float32)
    h0 = rng.normal(0, 0.5, (2, B, H)).astype(np.float32)
    c0 = rng.normal(0, 0.8, (2, B, H)).astype(np.float32)

    with torch.no_grad():
        layer(torch.from_numpy(emb1), (torch.from_numpy(h0), torch.from_numpy(c0)))
    layer.tracking(False)
    with torch.no_grad():
        out_ref, (hT_ref, cT_ref) = layer(
            torch.from_numpy(emb2), (torch.from_numpy(h0), torch.from_numpy(c0))
        )
    sf_ref = layer.input_quant.sf

    # --- ours ---
    tr = TRParams(weight_bits=8, group_size=8, weight_terms=24,
                  data_bits=8, data_terms=3, quantize_input=True)
    params = [
        {"w_ih": jnp.asarray(orig[f"weight_ih_l{i}"].T),
         "w_hh": jnp.asarray(orig[f"weight_hh_l{i}"].T),
         "b_ih": jnp.asarray(orig[f"bias_ih_l{i}"]),
         "b_hh": jnp.asarray(orig[f"bias_hh_l{i}"])}
        for i in range(2)
    ]
    qp = tr_lstm_convert(params, tr)  # layer 0 only, the reference default
    # layer-0 weights bit-exact; layer-1 untouched (the reference quirk)
    assert np.array_equal(np.asarray(qp[0]["w_ih"]).T,
                          layer.lstm.weight_ih_l0.detach().numpy())
    assert np.array_equal(np.asarray(qp[0]["w_hh"]).T,
                          layer.lstm.weight_hh_l0.detach().numpy())
    assert np.array_equal(np.asarray(qp[1]["w_ih"]).T, orig["weight_ih_l1"])

    qs = init_quant_state()
    _, _, qs = tr_lstm_apply(qp, tr, qs, jnp.asarray(emb1),
                             (jnp.asarray(h0), jnp.asarray(c0)), track=True)
    assert np.array_equal(np.asarray(qs["hist"]),
                          layer.input_quant.hist_bins.numpy())
    qs = finalize_quant_state(qs, tr.data_bits, tr.data_terms)
    assert _sf_close(qs["sf"], sf_ref), (float(qs["sf"]), sf_ref)

    out_ours, (hT, cT), _ = tr_lstm_apply(
        qp, tr, qs, jnp.asarray(emb2), (jnp.asarray(h0), jnp.asarray(c0)),
        track=False,
    )
    np.testing.assert_allclose(np.asarray(out_ours), out_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hT), hT_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cT), cT_ref.numpy(), atol=2e-5)
