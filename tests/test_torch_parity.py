"""Numerical parity of tq_tpu primitives against torch (CPU) references.

These pin the layout/padding/gate-order semantics that checkpoint import
relies on: NHWC/HWIO convs vs torch's NCHW/OIHW, TF-style SAME padding
vs efficientnet_pytorch's Conv2dStaticSamePadding, eval-mode batch norm,
max pooling, the fused-gate LSTM scan vs nn.LSTM, and a full
state_dict -> pytree import round trip on the MNIST MLP.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tq_tpu.layers.conv import conv2d
from tq_tpu.models.cnn_common import batch_norm


pytestmark = pytest.mark.slow  # heavyweight tier (make test-fast deselects)

def _nhwc(x_nchw):
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def _hwio(w_oihw):
    return jnp.asarray(w_oihw.transpose(2, 3, 1, 0))


@pytest.mark.parametrize("stride,pad,groups,k", [
    (1, 1, 1, 3), (2, 1, 1, 3), (4, 2, 1, 11), (2, 2, 1, 5), (1, 0, 1, 1),
    (1, 1, 8, 3), (2, 1, 16, 3),
])
def test_conv2d_matches_torch(rng, stride, pad, groups, k):
    ci, co = 16, 32
    x = rng.normal(size=(2, ci, 14, 14)).astype(np.float32)
    w = rng.normal(size=(co, ci // groups, k, k)).astype(np.float32) * 0.1
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   stride=stride, padding=pad, groups=groups).numpy()
    out = conv2d(_nhwc(x), _hwio(w), (stride, stride),
                 [(pad, pad), (pad, pad)], groups)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4
    )


@pytest.mark.parametrize("size,stride,k", [(15, 2, 3), (14, 2, 5), (7, 1, 3)])
def test_same_padding_matches_static_same(rng, size, stride, k):
    """XLA 'SAME' == efficientnet_pytorch Conv2dStaticSamePadding.

    That torch layer computes TF-style asymmetric padding
    (efficientnet_pytorch/utils.py): extra pixel goes right/bottom.
    """
    ci, co = 8, 16
    x = rng.normal(size=(1, ci, size, size)).astype(np.float32)
    w = rng.normal(size=(co, ci, k, k)).astype(np.float32) * 0.1
    # TF SAME in torch:
    out_sz = -(-size // stride)
    pad_total = max((out_sz - 1) * stride + k - size, 0)
    lo, hi = pad_total // 2, pad_total - pad_total // 2
    xp = F.pad(torch.from_numpy(x), (lo, hi, lo, hi))
    ref = F.conv2d(xp, torch.from_numpy(w), stride=stride).numpy()
    out = conv2d(_nhwc(x), _hwio(w), (stride, stride), "SAME")
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4
    )


def test_batch_norm_matches_torch_eval(rng):
    c = 12
    x = rng.normal(size=(2, c, 5, 5)).astype(np.float32)
    weight = rng.normal(size=c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=c).astype(np.float32)
    ref = F.batch_norm(
        torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(weight), torch.from_numpy(bias), False, 0.0, 1e-5,
    ).numpy()
    p = {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias),
         "mean": jnp.asarray(mean), "var": jnp.asarray(var)}
    out = batch_norm(p, _nhwc(x))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_maxpool_matches_torch(rng):
    x = rng.normal(size=(2, 8, 13, 13)).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), 3, 2, 1).numpy()
    out = jax.lax.reduce_window(
        _nhwc(x), -jnp.inf, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-6
    )


def test_lstm_scan_matches_torch(rng):
    """Our fused-gate lax.scan LSTM == nn.LSTM (2 layers, via import)."""
    from tq_tpu.layers.lstm import lstm_apply
    from tq_tpu.utils.torch_import import from_state_dict

    T, B, I, H, L = 5, 3, 6, 8, 2
    torch.manual_seed(0)
    m = torch.nn.LSTM(I, H, num_layers=L)
    m.eval()
    params = from_state_dict({f"rnn.{k}": v for k, v in m.state_dict().items()})
    layers = [
        {k: jnp.asarray(v) for k, v in layer.items()} for layer in params["rnn"]
    ]
    x = rng.normal(size=(T, B, I)).astype(np.float32)
    h0 = rng.normal(size=(L, B, H)).astype(np.float32)
    c0 = rng.normal(size=(L, B, H)).astype(np.float32)
    with torch.no_grad():
        ref, (hT, cT) = m(torch.from_numpy(x),
                          (torch.from_numpy(h0), torch.from_numpy(c0)))
    out, (hj, cj) = lstm_apply(layers, jnp.asarray(x),
                               (jnp.asarray(h0), jnp.asarray(c0)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hj), hT.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cj), cT.numpy(), atol=1e-5)


@pytest.mark.parametrize("cell", ["GRU", "RNN_TANH", "RNN_RELU"])
def test_rnn_cells_match_torch(rng, cell):
    """GRU / vanilla-RNN scan cells == torch (reference model.py:14-22
    supports all four recurrent types through one RNNModel)."""
    from tq_tpu.layers.lstm import rnn_apply
    from tq_tpu.utils.torch_import import from_state_dict

    T, B, I, H, L = 5, 3, 6, 8, 2
    torch.manual_seed(0)
    if cell == "GRU":
        m = torch.nn.GRU(I, H, num_layers=L)
    else:
        m = torch.nn.RNN(I, H, num_layers=L,
                         nonlinearity=cell.split("_")[1].lower())
    m.eval()
    params = from_state_dict({f"rnn.{k}": v for k, v in m.state_dict().items()})
    layers = [
        {k: jnp.asarray(v) for k, v in layer.items()} for layer in params["rnn"]
    ]
    x = rng.normal(size=(T, B, I)).astype(np.float32)
    h0 = rng.normal(size=(L, B, H)).astype(np.float32)
    with torch.no_grad():
        ref, hT = m(torch.from_numpy(x), torch.from_numpy(h0))
    out, hj = rnn_apply(layers, jnp.asarray(x), jnp.asarray(h0), cell)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hj), hT.numpy(), atol=1e-5)


def test_mlp_state_dict_import(rng):
    """torch 784-512-512-10 MLP forward == ours after import."""
    from tq_tpu.models import mlp
    from tq_tpu.utils.torch_import import from_state_dict

    torch.manual_seed(1)
    tm = torch.nn.Sequential()
    fc1 = torch.nn.Linear(784, 512)
    fc2 = torch.nn.Linear(512, 512)
    fc3 = torch.nn.Linear(512, 10)
    sd = {}
    for name, mod in (("fc1", fc1), ("fc2", fc2), ("fc3", fc3)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    params = from_state_dict(sd)
    params = {
        n: {"w": jnp.asarray(p["w"]), "b": jnp.asarray(p["b"])}
        for n, p in params.items()
    }
    x = rng.normal(size=(4, 1, 28, 28)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x).flatten(1)
        t = F.relu(fc1(t))
        t = F.relu(fc2(t))
        ref = F.log_softmax(fc3(t), dim=1).numpy()
    out = mlp.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("tied", [False, True])
def test_untied_lm_matches_torch(rng, tied):
    """Full RNNModel forward parity, UNTIED decoder included — the
    reference's *default* is untied (main.py:36-37 makes --tied
    opt-in); VERDICT r4 next #6.  Builds the reference architecture
    (Embedding -> 2-layer LSTM -> Linear) in torch, imports the
    state_dict, and compares log-probs."""
    from tq_tpu.models import lstm_lm
    from tq_tpu.utils.torch_import import from_state_dict

    V, E, H, L, T, B = 37, 12, 12, 2, 5, 3
    torch.manual_seed(0)
    emb = torch.nn.Embedding(V, E)
    rnn = torch.nn.LSTM(E, H, num_layers=L)
    dec = torch.nn.Linear(H, V)
    if tied:
        dec.weight = emb.weight  # reference model.py:28-34
    for m in (emb, rnn, dec):
        m.eval()

    params = {
        "encoder": {"w": jnp.asarray(emb.weight.detach().numpy())},
        "rnn": [
            {k: jnp.asarray(v) for k, v in layer.items()}
            for layer in from_state_dict(
                {f"rnn.{k}": v for k, v in rnn.state_dict().items()})["rnn"]
        ],
        "decoder": (
            {"b": jnp.asarray(dec.bias.detach().numpy())} if tied else
            {"w": jnp.asarray(dec.weight.detach().numpy().T),
             "b": jnp.asarray(dec.bias.detach().numpy())}
        ),
    }
    toks = rng.integers(0, V, (T, B))
    h0 = np.zeros((L, B, H), np.float32)
    c0 = np.zeros((L, B, H), np.float32)
    with torch.no_grad():
        e = emb(torch.from_numpy(toks))
        out, _ = rnn(e, (torch.from_numpy(h0), torch.from_numpy(c0)))
        ref = torch.log_softmax(dec(out.reshape(T * B, H)), dim=-1)
    logp, _ = lstm_lm.apply(params, jnp.asarray(toks),
                            (jnp.asarray(h0), jnp.asarray(c0)))
    np.testing.assert_allclose(np.asarray(logp), ref.numpy(), atol=1e-5)
