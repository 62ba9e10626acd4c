"""Sharded training / inference steps over a ('data', 'model') mesh.

This is the SPMD replacement for the reference's ``nn.DataParallel``
wrapper (evaluate_cnn.py:33): one jitted program whose inputs carry
``NamedSharding``s; GSPMD partitions the matmuls and inserts the ICI
collectives (gradient psums over 'data', activation collectives over
'model').  The same functions run on a 1x1 mesh (single chip), a virtual
CPU mesh (tests / dry runs) or a pod slice unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tq_tpu.models import mlp
from tq_tpu.parallel.sharding import batch_spec, mlp_param_specs, shard_pytree

__all__ = ["make_sharded_train_step", "make_sharded_eval_step", "setup_mlp_training"]


def _nll(logp, y):
    return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()


def make_sharded_train_step(opt, mesh: Mesh):
    """Jitted SPMD train step for the MNIST MLP.

    Batch is sharded over 'data'; params over 'model' per
    :func:`mlp_param_specs`.  Gradients inherit the param shardings, so
    the DP gradient reduction is a psum over 'data' GSPMD inserts at the
    sharded-matmul boundaries — no explicit pmean as in hand-rolled DP.
    """
    data = NamedSharding(mesh, batch_spec())

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            return _nll(mlp.apply(p, x, train=True, rng=rng), y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def run(params, opt_state, x, y, rng):
        x = jax.device_put(x, data)
        y = jax.device_put(y, data)
        return step(params, opt_state, x, y, rng)

    return run


def make_sharded_eval_step(mesh: Mesh):
    data = NamedSharding(mesh, batch_spec())

    @jax.jit
    def correct(params, x, y):
        logp = mlp.apply(params, x)
        return jnp.sum(jnp.argmax(logp, -1) == y)

    def run(params, x, y):
        return correct(params, jax.device_put(x, data), jax.device_put(y, data))

    return run


def setup_mlp_training(mesh: Mesh, lr: float = 1.0, seed: int = 0):
    """Init params + adadelta state, sharded over ``mesh``.

    Returns (params, opt, opt_state, train_step, eval_step).
    """
    params = mlp.init(jax.random.PRNGKey(seed))
    params = shard_pytree(params, mlp_param_specs(), mesh)
    opt = optax.adadelta(lr)
    opt_state = opt.init(params)
    return (
        params,
        opt,
        opt_state,
        make_sharded_train_step(opt, mesh),
        make_sharded_eval_step(mesh),
    )
