"""Quantization-aware training demo: MNIST MLP trained THROUGH term
revealing via the straight-through estimator.

The reference framework is strictly post-training (its sweeps convert a
pretrained model, evaluate_mlp.py:73-95); QAT is a beyond-reference
capability built on :func:`tq_tpu.ops.term_reveal.term_reveal_st`
(gradients pass through the fake-quantizer unchanged, no gradient to
the scale).  This driver trains the same MNISTMLP with every dense
weight term-revealed *inside the loss* at a given (wb, g, wt) setting,
then evaluates both the QAT model and a float-trained baseline under
identical post-training conversion (same two-phase calibration, same
eval protocol as the sweep driver), so the comparison isolates what
training through the quantizer recovers.

Usage:
    python -m tq_tpu.evals.qat_mlp [--wb 2] [--wt 2] [--db 2] [--dt 2]
                                   [--gs 1] [--epochs 3]

Prints one JSON line: {"setting": ..., "fp32_acc": ..., "ptq_acc": ...,
"qat_acc": ...}.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tq_tpu.models import mlp
from tq_tpu.ops.term_reveal import term_reveal_st
from tq_tpu.evals.train_mlp import nll_loss


def _st_scale(x, bits: int):
    """Dynamic per-tensor scale (conversion rule: max|.| / 2^(bits-1)),
    recomputed each step from the current values, under stop_gradient —
    the "quantize in the forward, float in the backward" QAT recipe."""
    return jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 2 ** (bits - 1)
    )


def qat_apply(params, x, wb, gs, wt, db, dt, train=False, rng=None,
              dropout=0.2, act_quant=False):
    """MLP forward with weights (and optionally activations)
    term-revealed via the ST estimator (mirrors ``mlp.apply``)."""
    x = x.reshape(x.shape[0], -1)
    for i, name in enumerate(mlp.LAYER_NAMES):
        p = params[name]
        wq = term_reveal_st(p["w"], _st_scale(p["w"], wb), wb, gs, wt, 0)
        if act_quant:
            x = term_reveal_st(x, _st_scale(x, db), db, 1, dt, 0)
        x = jnp.dot(x, wq, preferred_element_type=jnp.float32) + p["b"]
        if i < len(mlp.LAYER_NAMES) - 1:
            x = jax.nn.relu(x)
            if train:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
                x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    return jax.nn.log_softmax(x, axis=-1)


def train_qat(
    wb: int, gs: int, wt: int, db: int, dt: int,
    epochs: int = 3,
    batch_size: int = 64,
    lr: float = 1e-3,
    seed: int = 1,
    data_dir=None,
    verbose: bool = True,
):
    """Train with term-revealed weights; returns float (latent) params.

    The BinaryConnect-style stability recipe: Adam at a small lr, no
    dropout, and latent weights clipped to [-1, 1] after each update
    (which also pins the dynamic scale) — straight-through gradients
    through 1-2-bit quantizers are heavily noised, and the float
    recipe's Adadelta(1.0) diverges on them (measured: loss 31 -> 489).
    """
    from tq_tpu.data import load_mnist

    (xtr, ytr), (xte, yte), source = load_mnist(data_dir)
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = mlp.init(init_rng)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            logp = qat_apply(p, x, wb, gs, wt, db, dt, train=True, rng=rng,
                             dropout=0.0)
            return nll_loss(logp, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree_util.tree_map(
            lambda l: jnp.clip(l, -1.0, 1.0), new_params
        )
        return new_params, opt_state, loss

    n = len(ytr)
    steps = n // batch_size
    order_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        perm = order_rng.permutation(n)
        for i in range(steps):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            rng, drop = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(xtr[idx]),
                jnp.asarray(ytr[idx]), drop,
            )
        if verbose:
            print(f"qat epoch {epoch + 1}: loss={float(loss):.4f}",
                  flush=True)
    return params


def run_demo(wb=1, wt=1, db=6, dt=6, gs=1, epochs=3, data_dir=None,
             verbose=True):
    """(fp32_acc, ptq_acc, qat_acc) under identical conversion + eval.

    Default setting: binary weights (wb=wt=1) with the standard data
    quantization — the regime where post-training conversion visibly
    hurts and training through the quantizer recovers.  Eval uses the
    reference parity pipeline (same two-phase calibration, same
    protocol) for both models.
    """
    from tq_tpu.data import load_mnist
    from tq_tpu.evals.mlp import evaluate_setting
    from tq_tpu.evals.train_mlp import train

    _, (x_test, y_test), _ = load_mnist(data_dir)

    # Float baseline, trained with the reference recipe.
    fp_params, fp32_acc = train(epochs=epochs, data_dir=data_dir,
                                verbose=verbose)
    ptq_acc, _, _ = evaluate_setting(
        fp_params, wb, wt, db, dt, gs, x_test=x_test, y_test=y_test)

    # Same architecture trained through the quantizer.
    qat_params = train_qat(wb, gs, wt, db, dt, epochs=epochs,
                           data_dir=data_dir, verbose=verbose)
    qat_acc, _, _ = evaluate_setting(
        qat_params, wb, wt, db, dt, gs, x_test=x_test, y_test=y_test)
    return fp32_acc, ptq_acc, qat_acc


def main(argv=None):
    from tq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--wb", type=int, default=1)
    ap.add_argument("--wt", type=int, default=1)
    ap.add_argument("--db", type=int, default=6)
    ap.add_argument("--dt", type=int, default=6)
    ap.add_argument("--gs", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--data-dir", default=None)
    a = ap.parse_args(argv)
    fp32_acc, ptq_acc, qat_acc = run_demo(
        a.wb, a.wt, a.db, a.dt, a.gs, a.epochs, a.data_dir)
    print(json.dumps({
        "setting": dict(wb=a.wb, wt=a.wt, db=a.db, dt=a.dt, gs=a.gs),
        "fp32_acc": round(fp32_acc, 2),
        "ptq_acc": round(ptq_acc, 2),
        "qat_acc": round(qat_acc, 2),
    }))


if __name__ == "__main__":
    main()
