"""End-to-end MLP slice: train -> convert -> calibrate -> eval -> profile.

The minimum end-to-end slice from SURVEY.md §7, run on synthetic MNIST
(small sizes for CI speed).
"""

import numpy as np
import pytest

from tq_tpu.data.synthetic import synthetic_mnist
from tq_tpu.evals.mlp import evaluate_setting
from tq_tpu.evals.train_mlp import train
from tq_tpu.utils.checkpoint import load_params, save_params


pytestmark = pytest.mark.slow  # heavyweight tier (make test-fast deselects)

@pytest.fixture(scope="module")
def trained():
    (xtr, ytr), (xte, yte) = synthetic_mnist(num_train=4000, num_test=1000)

    # quick training run directly on the arrays
    import jax, optax
    import jax.numpy as jnp
    from tq_tpu.models import mlp

    params = mlp.init(jax.random.PRNGKey(0))
    opt = optax.adadelta(1.0)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            logp = mlp.apply(p, x, train=True, rng=rng)
            return -jnp.take_along_axis(logp, y[:, None], 1).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, loss

    rng = jax.random.PRNGKey(1)
    for epoch in range(3):
        for i in range(0, 4000, 128):
            rng, d = jax.random.split(rng)
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(xtr[i : i + 128]),
                jnp.asarray(ytr[i : i + 128]), d,
            )
    return params, xte, yte


def _fp32_acc(params, x, y):
    import jax.numpy as jnp
    from tq_tpu.models import mlp

    logp = mlp.apply(params, jnp.asarray(x))
    return 100.0 * float(jnp.mean(jnp.argmax(logp, -1) == jnp.asarray(y)))


def test_two_phase_uq_close_to_fp32(trained):
    params, xte, yte = trained
    base = _fp32_acc(params, xte, yte)
    assert base > 85.0, f"synthetic task should be learnable, got {base}"
    acc, tmacs, bits = evaluate_setting(
        params, wb=6, wt=6, db=6, dt=6, gs=1, x_test=xte, y_test=yte
    )
    assert abs(acc - base) < 2.0, (acc, base)
    assert tmacs == 6 * 6 * 668672
    assert bits == 6 * 668672


def test_two_phase_tr_moderate_degradation(trained):
    params, xte, yte = trained
    base = _fp32_acc(params, xte, yte)
    acc, tmacs, bits = evaluate_setting(
        params, wb=4, wt=6, db=6, dt=6, gs=16, x_test=xte, y_test=yte
    )
    assert acc > base - 6.0, (acc, base)
    assert tmacs == 1504512  # results/mnist-tr.json first entry
    assert 0 < bits < 4 * 668672  # compressed HESE beats raw 4-bit storage


def test_fixed_linear_input_quant_changes_results(trained):
    """compat mode ignores data quantization entirely (tr_layer.py:154);
    with aggressive dt=2 the fixed path must produce different logits."""
    import jax.numpy as jnp
    from tq_tpu.models import mlp

    params, xte, yte = trained
    logps = {}
    for qi in (False, True):
        qp, qc, qs = mlp.convert(
            params, mlp.static_layer_settings(4, 16, 6), 4, 2,
            quantize_input=qi,
        )
        track = mlp.make_quantized_apply(qc, track=True)
        _, qs = track(qp, qs, jnp.asarray(xte[:200]))
        qs = mlp.finalize(qs, qc)
        ev = mlp.make_quantized_apply(qc, track=False)
        logp, _ = ev(qp, qs, jnp.asarray(xte[:200]))
        logps[qi] = np.asarray(logp)
    assert not np.allclose(logps[False], logps[True])


def test_checkpoint_roundtrip(tmp_path, trained):
    params, xte, yte = trained
    p = tmp_path / "mlp.npz"
    save_params(p, params)
    loaded = load_params(p)
    np.testing.assert_array_equal(
        np.asarray(params["fc1"]["w"]), loaded["fc1"]["w"]
    )
    assert _fp32_acc(loaded, xte[:200], yte[:200]) == _fp32_acc(
        params, xte[:200], yte[:200]
    )
