"""MNIST MLP workload: 784-512-512-10 (reference train_mlp.py:10-26).

Provides the fp32 model (init/apply/train-ready), TR conversion
(equivalent of ``replace_linear_layers`` + ``static_linear_layer_settings``
in evaluate_mlp.py:14-40), and the shape table for the op counter.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from tq_tpu.layers.common import TRParams
from tq_tpu.layers.linear import (
    finalize_quant_state,
    init_quant_state,
    tr_dense_apply,
    tr_dense_convert,
)
from tq_tpu.profilers import LayerCost

LAYER_NAMES = ("fc1", "fc2", "fc3")
DIMS = ((784, 512), (512, 512), (512, 10))
DROPOUT = 0.2


def init(rng):
    """Kaiming-uniform init matching torch.nn.Linear defaults."""
    params = {}
    for name, (fan_in, fan_out) in zip(LAYER_NAMES, DIMS):
        rng, wk, bk = jax.random.split(rng, 3)
        bound = 1.0 / jnp.sqrt(fan_in)  # torch Linear default bound
        params[name] = {
            "w": jax.random.uniform(
                wk, (fan_in, fan_out), minval=-bound, maxval=bound
            ),
            "b": jax.random.uniform(bk, (fan_out,), minval=-bound, maxval=bound),
        }
    return params


def apply(params, x, train: bool = False, rng=None):
    """Forward pass -> log-probabilities (train_mlp.py:23-26)."""
    x = x.reshape(x.shape[0], -1)
    for i, name in enumerate(LAYER_NAMES):
        p = params[name]
        x = jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]
        if i < len(LAYER_NAMES) - 1:
            x = jax.nn.relu(x)
            if train:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - DROPOUT, x.shape)
                x = jnp.where(keep, x / (1.0 - DROPOUT), 0.0)
    return jax.nn.log_softmax(x, axis=-1)


def layer_costs(batch: int = 1) -> list[LayerCost]:
    """Shape table for the term-MAC counter (batch=1 matches the
    reference's profile call, evaluate_mlp.py:88)."""
    return [
        LayerCost(
            "dense", name, batch * d_out, d_in, weight_numel=d_in * d_out
        )
        for name, (d_in, d_out) in zip(LAYER_NAMES, DIMS)
    ]


def static_layer_settings(
    weight_bits: int, group_size: int, num_terms: int
) -> list[tuple[int, int, int]]:
    """Uniform per-layer settings (evaluate_mlp.py:32-40)."""
    return [(weight_bits, group_size, num_terms)] * len(LAYER_NAMES)


def convert(
    params,
    tr_settings: Sequence[tuple[int, int, int]],
    data_bits: int,
    data_terms: int,
    quantize_input: bool = False,
):
    """TR-convert every dense layer (evaluate_mlp.py:14-30).

    ``quantize_input=False`` reproduces the reference's ``TRLinearLayer``
    forward, which computes but never uses the quantized activations
    (tr_layer.py:153-154); True gives the fixed behaviour.

    Returns (qparams, qcfg, qstate).
    """
    qparams, qcfg, qstate = {}, {}, {}
    for name, (wb, gs, wt) in zip(LAYER_NAMES, tr_settings):
        tr = TRParams(
            weight_bits=wb,
            group_size=gs,
            weight_terms=wt,
            data_bits=data_bits,
            data_terms=data_terms,
            quantize_input=quantize_input,
        )
        qparams[name] = tr_dense_convert(params[name], tr)
        qcfg[name] = tr
        qstate[name] = init_quant_state()
    return qparams, qcfg, qstate


def make_quantized_apply(qcfg, track: bool):
    """Build a jitted two-phase forward for the converted model.

    qcfg is closed over (TRParams are static); returns
    ``f(qparams, qstate, x) -> (logp, new_qstate)``.
    """

    @jax.jit
    def forward(qparams, qstate, x):
        x = x.reshape(x.shape[0], -1)
        new_state = {}
        for i, name in enumerate(LAYER_NAMES):
            x, new_state[name] = tr_dense_apply(
                qparams[name], qcfg[name], qstate[name], x, track
            )
            if i < len(LAYER_NAMES) - 1:
                x = jax.nn.relu(x)
        return jax.nn.log_softmax(x, axis=-1), new_state

    return forward


def finalize(qstate, qcfg):
    """Run the MSE scale search for every layer (set_tr_tracking False)."""
    return {
        name: finalize_quant_state(
            qstate[name], qcfg[name].data_bits, qcfg[name].data_terms
        )
        for name in qstate
    }
