"""Train the MNIST MLP (equivalent of the reference's train_mlp.py).

Adadelta(lr=1.0) with a 0.7-per-epoch step decay, NLL loss on
log-softmax outputs (train_mlp.py:29-41,112-118).  Works on real MNIST
(``TQ_DATA_DIR``) or the synthetic fallback; saves a .npz checkpoint
consumed by the sweep drivers.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tq_tpu.data import load_mnist
from tq_tpu.models import mlp
from tq_tpu.utils.checkpoint import save_params, load_params


def nll_loss(logp, y):
    return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()


def train(
    epochs: int = 5,
    batch_size: int = 64,
    lr: float = 1.0,
    gamma: float = 0.7,
    seed: int = 1,
    data_dir: str | None = None,
    save_path: str | None = None,
    verbose: bool = True,
    test_batch_size: int = 1000,
    log_interval: int | None = None,
    dry_run: bool = False,
):
    """``test_batch_size``/``log_interval``/``dry_run`` mirror the
    reference CLI (train_mlp.py:70-88); ``dry_run`` runs a single
    train batch + a single eval batch and returns."""
    (xtr, ytr), (xte, yte), source = load_mnist(data_dir)
    if verbose:
        print(f"data source: {source}; train={len(ytr)} test={len(yte)}")

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = mlp.init(init_rng)

    schedule = optax.exponential_decay(
        lr, transition_steps=len(ytr) // batch_size, decay_rate=gamma,
        staircase=True,
    )
    opt = optax.adadelta(schedule)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            logp = mlp.apply(p, x, train=True, rng=rng)
            return nll_loss(logp, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_batch(params, x, y):
        logp = mlp.apply(params, x)
        return jnp.sum(jnp.argmax(logp, -1) == y)

    n = len(ytr)
    steps = n // batch_size
    order_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        perm = order_rng.permutation(n)
        for i in range(steps):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            rng, drop = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(xtr[idx]), jnp.asarray(ytr[idx]), drop
            )
            if log_interval and i % log_interval == 0:
                # One host fetch per interval (train_mlp.py:37-41).
                print(f"Train Epoch: {epoch + 1} "
                      f"[{i * batch_size}/{n}]\tLoss: {float(loss):.6f}")
            if dry_run:
                break
        correct = 0
        for i in range(0, len(yte), test_batch_size):
            correct += int(
                eval_batch(params, jnp.asarray(xte[i : i + test_batch_size]),
                           jnp.asarray(yte[i : i + test_batch_size]))
            )
            if dry_run:
                break
        if verbose:
            print(f"epoch {epoch + 1}: loss={float(loss):.4f} "
                  f"test_acc={100.0 * correct / len(yte):.2f}%")
        if dry_run:
            break

    if save_path:
        save_params(save_path, params)
    return params, 100.0 * correct / len(yte)


def load_or_train(path: str = "pretrained/mnist_mlp.npz", **kw):
    p = Path(path)
    if p.exists():
        return load_params(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    params, _ = train(save_path=path, **kw)
    return params


def main(argv=None):
    from tq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--test-batch-size", type=int, default=1000,
                    help="eval batch size (train_mlp.py:72-73)")
    ap.add_argument("--lr", type=float, default=1.0)
    ap.add_argument("--gamma", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--log-interval", type=int, default=0,
                    help="batches between loss prints "
                         "(train_mlp.py:84-86); 0 disables")
    ap.add_argument("--dry-run", action="store_true",
                    help="single train+eval batch (train_mlp.py:80-81)")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--save-model", default="pretrained/mnist_mlp.npz")
    a = ap.parse_args(argv)
    Path(a.save_model).parent.mkdir(parents=True, exist_ok=True)
    train(a.epochs, a.batch_size, a.lr, a.gamma, a.seed, a.data_dir,
          a.save_model, test_batch_size=a.test_batch_size,
          log_interval=a.log_interval or None, dry_run=a.dry_run)


if __name__ == "__main__":
    main()
