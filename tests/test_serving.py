"""Continuous-batching runner on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tq_tpu.parallel.mesh import make_mesh
from tq_tpu.parallel.serving import BatchRunner

# SPMD tests need the virtual multi-device mesh; under TQ_TEST_TPU=1
# the suite runs on ONE real chip, where these are meaningless (the
# sharding semantics are identical on the virtual CPU mesh — conftest).
pytestmark = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs >= 8 devices (virtual CPU mesh; TQ_TEST_TPU runs on one chip)")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=8, n_model=1)


def test_batches_and_tail_padding(mesh, rng):
    forward = jax.jit(lambda x: x.sum(axis=(1, 2)))
    runner = BatchRunner(forward, mesh, batch_size=16)
    examples = [rng.normal(size=(4, 4)).astype(np.float32) for _ in range(37)]
    results = runner.run_all(examples)
    assert len(results) == 37
    for e, r in zip(examples, results):
        np.testing.assert_allclose(r, e.sum(), rtol=1e-4, atol=1e-6)


def test_quantized_mlp_serving(mesh, rng):
    from tq_tpu.models import mlp

    params = mlp.init(jax.random.PRNGKey(0))
    settings = mlp.static_layer_settings(4, 16, 14)
    qparams, qcfg, qstate = mlp.convert(params, settings, 6, 6, True)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    fwd = mlp.make_quantized_apply(qcfg, track=False)
    runner = BatchRunner(
        lambda x: fwd(qparams, qstate, x)[0], mesh, batch_size=32
    )
    examples = [rng.normal(size=(1, 28, 28)).astype(np.float32)
                for _ in range(50)]
    results = runner.run_all(examples)
    assert len(results) == 50
    assert all(r.shape == (10,) for r in results)
    # Results must equal the plain batched forward (padding row ignored).
    x = jnp.asarray(np.stack(examples))
    ref, _ = fwd(qparams, qstate, x)
    # Different batch shapes change fp accumulation order; a value at a
    # rounding boundary can flip one quantization level, so compare
    # loosely plus exact predicted classes.
    np.testing.assert_allclose(np.stack(results), np.asarray(ref),
                               rtol=2e-2, atol=1e-2)
    np.testing.assert_array_equal(
        np.argmax(np.stack(results), -1), np.argmax(np.asarray(ref), -1)
    )


def test_rejects_bad_batch_size(mesh):
    with pytest.raises(ValueError):
        BatchRunner(lambda x: x, mesh, batch_size=12)  # not /8
