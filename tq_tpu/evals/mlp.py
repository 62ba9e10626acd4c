"""MNIST MLP UQ/TR sweep (equivalent of evaluate_mlp.py + evaluate_mlp.sh).

Protocol per setting (evaluate_mlp.py:73-92): convert -> calibration pass
on 5% of the test set -> finalize scales -> full eval -> profile ->
append to the results lists.  Output schema matches
``results/mnist-{quant,tr}.json``: {"accs": [], "tmacs": [], "param_bits": []}.

Improvements over the reference (documented, not silent):
  * results are flushed to disk after every setting (the reference loses
    the whole sweep on a crash — SURVEY.md §5 failure-detection row);
  * the profile call works (the committed evaluate_mlp.py:88 passes a
    keyword its own function signature rejects);
  * ``--fixed-linear`` enables real input quantization (the reference's
    TRLinearLayer drops it, tr_layer.py:154).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from tq_tpu.layers.common import TRParams
from tq_tpu.models import mlp
from tq_tpu.profilers import model_cost
from tq_tpu.evals.train_mlp import load_or_train


def evaluate_setting(
    params,
    wb: int,
    wt: int,
    db: int,
    dt: int,
    gs: int,
    x_test: np.ndarray,
    y_test: np.ndarray,
    batch_size: int = 128,
    calib_pct: float = 0.05,
    quantize_input: bool = False,
    shuffle_seed: int | None = 0,
    merge_hack: bool = True,
):
    """Run one (wb, wt, db, dt, gs) setting; returns (acc%, tmacs, bits).

    The reference calibrates on a *shuffled* test loader's first 5%
    (evaluate_mlp.py:65,82); ``shuffle_seed`` reproduces that.
    """
    settings = mlp.static_layer_settings(wb, gs, wt)
    qparams, qcfg, qstate = mlp.convert(
        params, settings, db, dt, quantize_input=quantize_input
    )

    order = np.arange(len(y_test))
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(order)

    # Phase 1: calibration on the first `calib_pct` of samples.
    track_fwd = mlp.make_quantized_apply(qcfg, track=True)
    n_calib = round(calib_pct * len(y_test))
    seen = 0
    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        _, qstate = track_fwd(qparams, qstate, jnp.asarray(x_test[idx]))
        seen += len(idx)
        if seen >= n_calib:
            break
    qstate = mlp.finalize(qstate, qcfg)

    # Phase 2: full evaluation.
    eval_fwd = mlp.make_quantized_apply(qcfg, track=False)
    # Device-side accumulator: a per-batch int() would host-sync every
    # batch (~30 ms RTT each on the tunneled chip); fetch once at the end.
    correct = jnp.int32(0)
    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        logp, _ = eval_fwd(qparams, qstate, jnp.asarray(x_test[idx]))
        correct = correct + jnp.sum(jnp.argmax(logp, -1) == jnp.asarray(y_test[idx]))
    acc = 100.0 * int(correct) / len(y_test)

    # Profile (shape-based; batch=1 like evaluate_mlp.py:88 intends).
    layer_trs = [
        TRParams(wb, gs, wt, db, dt) for _ in mlp.LAYER_NAMES
    ]
    weights = {n: qparams[n]["w"] for n in mlp.LAYER_NAMES}
    scales = {n: qparams[n]["w_sf"] for n in mlp.LAYER_NAMES}
    tmacs, param_bits = model_cost(
        list(zip(mlp.layer_costs(batch=1), layer_trs)), weights, scales,
        merge_hack=merge_hack,
    )
    return acc, tmacs, param_bits


def run_sweep(
    wb, wt, db, dt, gs, out_file, checkpoint="pretrained/mnist_mlp.npz",
    data_dir=None, quantize_input=False, verbose=True, merge_hack=True,
):
    from tq_tpu.data import load_mnist

    params = load_or_train(checkpoint, data_dir=data_dir)
    _, (x_test, y_test), source = load_mnist(data_dir)
    if verbose:
        print(f"eval data source: {source}")

    results = {"accs": [], "tmacs": [], "param_bits": []}
    # Crash resume: skip settings already present in a partial out_file.
    if out_file and Path(out_file).exists():
        prior = json.loads(Path(out_file).read_text())
        if prior.get("accs"):
            results = prior
    skip = len(results["accs"])
    for i, setting in enumerate(zip(wb, wt, db, dt, gs)):
        if i < skip:
            continue
        acc, tmacs, bits = evaluate_setting(
            params, *setting, x_test=x_test, y_test=y_test,
            quantize_input=quantize_input, merge_hack=merge_hack,
        )
        results["accs"].append(acc)
        results["tmacs"].append(float(tmacs))
        results["param_bits"].append(float(bits))
        if verbose:
            print(*setting, acc, tmacs, bits)
        if out_file:  # flush incrementally: crashed sweeps resume cheaply
            Path(out_file).parent.mkdir(parents=True, exist_ok=True)
            with open(out_file, "w") as fp:
                json.dump(results, fp)
    return results


def main(argv=None):
    from tq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="MNIST MLP UQ/TR sweep")
    ap.add_argument("--wb", nargs="+", type=int, required=True)
    ap.add_argument("--wt", nargs="+", type=int, required=True)
    ap.add_argument("--db", nargs="+", type=int, required=True)
    ap.add_argument("--dt", nargs="+", type=int, required=True)
    ap.add_argument("--gs", nargs="+", type=int, required=True)
    ap.add_argument("--out-file", required=True)
    ap.add_argument("--checkpoint", default="pretrained/mnist_mlp.npz")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--fixed-linear", action="store_true",
                    help="really quantize dense inputs (fixes tr_layer.py:154)")
    ap.add_argument("--sound-hese", action="store_true",
                    help="count param_bits with the sound CSD automaton "
                         "instead of the reference's merging-neighbors hese()")
    a = ap.parse_args(argv)
    run_sweep(a.wb, a.wt, a.db, a.dt, a.gs, a.out_file, a.checkpoint,
              a.data_dir, quantize_input=a.fixed_linear,
              merge_hack=not a.sound_hese)


if __name__ == "__main__":
    main()
