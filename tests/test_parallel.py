"""Multi-device mesh tests on virtual CPU devices (8, via conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tq_tpu.parallel.mesh import make_mesh
from tq_tpu.parallel.sharding import mlp_param_specs, shard_pytree

# SPMD tests need the virtual multi-device mesh; under TQ_TEST_TPU=1
# the suite runs on ONE real chip, where these are meaningless (the
# sharding semantics are identical on the virtual CPU mesh — conftest).
pytestmark = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs >= 8 devices (virtual CPU mesh; TQ_TEST_TPU runs on one chip)")
from tq_tpu.parallel.train import setup_mlp_training
from tq_tpu.models import mlp


def _fake_batch(rng, n=32):
    x = jnp.asarray(rng.normal(size=(n, 1, 28, 28)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(n,)), jnp.int32)
    return x, y


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_mesh_bad_factorization():
    with pytest.raises(ValueError):
        make_mesh(n_model=3)  # 8 devices not divisible by 3


@pytest.mark.slow
def test_sharded_train_step_runs_and_matches_single(rng):
    """One DPxTP train step must equal the single-device step numerically."""
    mesh = make_mesh(n_data=4, n_model=2)
    params, opt, opt_state, train_step, eval_step = setup_mlp_training(
        mesh, lr=1.0, seed=0
    )
    x, y = _fake_batch(rng)
    key = jax.random.PRNGKey(7)
    p2, s2, loss_sharded = train_step(params, opt_state, x, y, key)
    correct = eval_step(p2, x, y)
    assert 0 <= int(correct) <= len(y)

    # Single-device referenced step (no mesh, same math).
    import optax

    params0 = mlp.init(jax.random.PRNGKey(0))
    opt0 = optax.adadelta(1.0)
    st0 = opt0.init(params0)

    def loss_fn(p):
        logp = mlp.apply(p, x, train=True, rng=key)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    loss_ref, grads = jax.value_and_grad(loss_fn)(params0)
    np.testing.assert_allclose(
        float(loss_sharded), float(loss_ref), rtol=1e-5
    )


def test_shard_pytree_places_leaves():
    mesh = make_mesh(n_data=4, n_model=2)
    params = mlp.init(jax.random.PRNGKey(0))
    sharded = shard_pytree(params, mlp_param_specs(), mesh)
    # fc1 kernel sharded over model axis on the out-features dim.
    w = sharded["fc1"]["w"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    # Scale-free leaves replicate.
    assert sharded["fc3"]["w"].sharding.spec == jax.sharding.PartitionSpec(
        None, None
    )


def test_quantized_forward_under_mesh(rng):
    """TR-converted model runs with batch-sharded inputs on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=8, n_model=1)
    params = mlp.init(jax.random.PRNGKey(0))
    settings = mlp.static_layer_settings(4, 16, 14)
    qparams, qcfg, qstate = mlp.convert(params, settings, 6, 6, True)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    fwd = mlp.make_quantized_apply(qcfg, track=False)

    x, _ = _fake_batch(rng, n=64)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    logp, _ = fwd(qparams, qstate, xs)
    assert logp.shape == (64, 10)
    assert bool(jnp.all(jnp.isfinite(logp)))


@pytest.mark.slow
def test_cnn_tensor_parallel_params(rng):
    """Quantized ResNet-18 with conv kernels sharded over 'model' (TP)
    + batch over 'data' matches the unsharded forward."""
    from tq_tpu.convert import convert_cnn, static_conv_layer_settings
    from tq_tpu.convert.cnn import make_cnn_apply
    from tq_tpu.models import resnet
    from tq_tpu.parallel.sharding import cnn_param_specs, shard_batch

    params = resnet.init(jax.random.PRNGKey(0))
    settings = static_conv_layer_settings(resnet.conv_specs(), 8, 8, 16)
    qparams, qcfg, qstate = convert_cnn(resnet, params, settings, 8, 4)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    fwd = make_cnn_apply(resnet, qcfg, track=False)

    x = jnp.asarray(rng.normal(size=(8, 64, 64, 3)), jnp.float32)
    ref, _ = fwd(qparams, qstate, x)

    mesh = make_mesh(n_data=2, n_model=4)
    qp_sharded = shard_pytree(qparams, cnn_param_specs(qparams), mesh)
    xs = shard_batch(x, mesh)
    out, _ = fwd(qp_sharded, qstate, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
