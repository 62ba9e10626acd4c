"""Pipeline-parallel schedule: parity with sequential execution + grads.

Runs on the virtual 8-device CPU mesh (conftest). PP is a new
capability beyond the reference (SURVEY.md §2.4: "Pipeline: absent").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tq_tpu.parallel.pp import (
    build_mlp_pipeline,
    make_pipeline_mesh,
    make_tr_block_fn,
    pipeline_apply,
)

# SPMD tests need the virtual multi-device mesh; under TQ_TEST_TPU=1
# the suite runs on ONE real chip, where these are meaningless (the
# sharding semantics are identical on the virtual CPU mesh — conftest).
pytestmark = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs >= 8 devices (virtual CPU mesh; TQ_TEST_TPU runs on one chip)")


def _block(p, x):
    return jax.nn.relu(jnp.dot(x, p["w"]) + p["b"])


def _sequential(stage_params, x_micro, block):
    out = []
    for m in range(x_micro.shape[0]):
        h = x_micro[m]
        for s in range(stage_params["w"].shape[0]):
            h = block(jax.tree.map(lambda l: l[s], stage_params), h)
        out.append(h)
    return jnp.stack(out)


@pytest.mark.parametrize("n_stage,n_micro", [(4, 8), (2, 3), (8, 1), (1, 4)])
def test_pipeline_matches_sequential(rng, n_stage, n_micro):
    mesh = make_pipeline_mesh(n_stage)
    width, mb = 16, 8
    sp = {
        "w": jnp.asarray(rng.normal(size=(n_stage, width, width)) * 0.3,
                         jnp.float32),
        "b": jnp.asarray(rng.normal(size=(n_stage, width)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(n_micro, mb, width)), jnp.float32)
    got = pipeline_apply(sp, x, _block, mesh)
    want = _sequential(sp, x, _block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_composes_with_data_axis(rng):
    mesh = make_pipeline_mesh(n_stage=4, n_data=2)
    width = 8
    sp = {
        "w": jnp.asarray(rng.normal(size=(4, width, width)) * 0.3, jnp.float32),
        "b": jnp.zeros((4, width), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(5, 4, width)), jnp.float32)  # mb=4 over 2
    got = pipeline_apply(sp, x, _block, mesh)
    want = _sequential(sp, x, _block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pipeline_gradients_match_sequential(rng):
    mesh = make_pipeline_mesh(4)
    width = 8
    sp = {
        "w": jnp.asarray(rng.normal(size=(4, width, width)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.normal(size=(4, width)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(6, 4, width)), jnp.float32)

    def loss_pp(sp):
        return jnp.sum(pipeline_apply(sp, x, _block, mesh) ** 2)

    def loss_seq(sp):
        return jnp.sum(_sequential(sp, x, _block) ** 2)

    g_pp = jax.grad(loss_pp)(sp)
    g_seq = jax.grad(loss_seq)(sp)
    for k in sp:
        np.testing.assert_allclose(np.asarray(g_pp[k]), np.asarray(g_seq[k]),
                                   rtol=1e-4, atol=1e-4)


def test_tr_block_under_pipeline(rng):
    """Quantized (term-revealed) serving blocks run under PP unchanged."""
    mesh = make_pipeline_mesh(4)
    width = 16
    block = make_tr_block_fn(bits=7, num_keep_terms=3)
    sp = {
        "w": jnp.asarray(rng.normal(size=(4, width, width)) * 0.3, jnp.float32),
        "b": jnp.zeros((4, width), jnp.float32),
        "w_sf": jnp.full((4,), 0.01, jnp.float32),
        "a_sf": jnp.full((4,), 0.05, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(6, 4, width)), jnp.float32)
    got = pipeline_apply(sp, x, block, mesh)
    want = _sequential(sp, x, block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(got)).all()


@pytest.mark.slow
def test_mlp_pipeline_end_to_end(rng):
    mesh = make_pipeline_mesh(8)
    params, forward = build_mlp_pipeline(jax.random.PRNGKey(0), n_stage=8,
                                         width=32, in_dim=20, n_classes=10)
    x = jnp.asarray(rng.normal(size=(4, 8, 20)), jnp.float32)
    logp = forward(params, x, mesh)
    assert logp.shape == (4, 8, 10)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-5)
