"""Quantization-aware training via the straight-through term_reveal_st.

The reference is strictly post-training (SURVEY.md §3.3); the ST
estimator is a framework extension: gradients pass through the
fake-quantizer unchanged, so a model can train *through* term revealing.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tq_tpu.ops.term_reveal import term_reveal, term_reveal_st


def test_gradient_is_straight_through(rng):
    x = jnp.asarray(rng.normal(size=(32,)), jnp.float32)

    def f(x):
        return jnp.sum(term_reveal_st(x, jnp.float32(0.05), 6, 1, 3, 0) ** 2)

    g = jax.grad(f)(x)
    # d/dx sum(q(x)^2) with straight-through q' = 1  ->  2 * q(x)
    q = term_reveal(x, jnp.float32(0.05), 6, 1, 3, axis=0)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(q), rtol=1e-5)


def test_qat_training_reduces_loss(rng):
    """Tiny regression problem trained THROUGH weight term revealing."""
    k = jax.random.PRNGKey(0)
    w_true = jax.random.normal(k, (16, 4)) * 0.5
    x = jnp.asarray(rng.normal(size=(128, 16)), jnp.float32)
    y = x @ w_true

    params = {"w": jnp.zeros((16, 4))}
    opt = optax.adam(5e-2)
    state = opt.init(params)

    def loss_fn(p):
        wq = term_reveal_st(p["w"], jnp.float32(0.02), 8, 8, 12, 0)
        return jnp.mean((x @ wq - y) ** 2)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    losses = []
    for _ in range(150):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < 0.05 * losses[0]
    # The deployed weights are genuinely term-revealed (multiples of sf).
    wq = term_reveal(params["w"], jnp.float32(0.02), 8, 8, 12, axis=0)
    ratio = np.asarray(wq) / 0.02
    np.testing.assert_allclose(ratio, np.round(ratio), atol=1e-4)


@pytest.mark.slow
def test_qat_mlp_apply_and_grad(rng):
    """qat_mlp demo plumbing: ST forward produces finite log-probs and
    nonzero straight-through gradients to every layer."""
    from tq_tpu.evals.qat_mlp import qat_apply
    from tq_tpu.models import mlp

    params = mlp.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(8, 1, 28, 28)), jnp.float32)
    logp = qat_apply(params, x, 1, 1, 1, 6, 6)
    assert logp.shape == (8, 10)
    assert bool(jnp.all(jnp.isfinite(logp)))

    def loss(p):
        return -jnp.mean(qat_apply(p, x, 1, 1, 1, 6, 6)[:, 0])

    g = jax.grad(loss)(params)
    for name in mlp.LAYER_NAMES:
        assert float(jnp.sum(jnp.abs(g[name]["w"]))) > 0
