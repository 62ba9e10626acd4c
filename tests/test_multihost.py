"""Multi-host helpers on the single-process virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tq_tpu.parallel.multihost import global_mesh, host_local_batch, scaling_report


def test_global_mesh_shapes():
    mesh = global_mesh(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        global_mesh(n_model=3)


def test_host_local_batch_shards_over_data():
    mesh = global_mesh()
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    arr = host_local_batch(mesh, x)
    assert arr.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_scaling_report_runs():
    mesh = global_mesh()
    step = jax.jit(lambda x: jnp.tanh(x) @ jnp.ones((8, 8)))
    rep = scaling_report(
        step, lambda: np.ones((16, 8), np.float32), mesh, iters=3
    )
    assert rep["items_per_s"] > 0
    assert rep["n_devices"] == 8
    assert rep["n_processes"] == 1


def test_device_trace_writes(tmp_path):
    from tq_tpu.utils.trace import device_trace

    with device_trace(str(tmp_path), "t") as p:
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert any(p.rglob("*"))  # trace files exist
