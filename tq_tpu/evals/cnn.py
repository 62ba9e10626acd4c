"""ImageNet CNN UQ/TR sweep (equivalent of evaluate_cnn.py + evaluate_cnn.sh).

Protocol per setting (evaluate_cnn.py:20-42): per-layer setting table ->
convert -> profile -> calibration pass on 5% of val -> finalize scales ->
full eval.  Output schema matches ``results/<arch>-results.json``:
``{quant, tr-data2, tr-data3, tr-data4} x {accs, tmacs, avg_terms, params}``.

Sweeps: two grids are supported (``--grid``):

* ``committed`` — the reference repo's committed script
  (evaluate_cnn.py:94-127): UQ = wb in {6,7,8,9} at (g=1, wt=9, db=dt=9);
  TR = wb=9, g=8, dt in {2,3,4} x wt in {12,16,20,24}.
* ``published`` (default) — the per-arch grids the *published*
  ``results/<arch>-results.json`` files were actually generated with,
  reverse-derived from their avg_terms/tmacs columns (every value is an
  exact multiple of the spec-table MACs): resnet18/vgg16_bn used
  UQ wb in {5..9} with wt=wb at dt'=8, and TR wt in {8,10,12,14,16}
  with dt in {2,3} only; mobilenet_v2/efficientnet_b0 match the
  committed script.  With this grid every deterministic column of the
  generated files diffs 1:1 against the published ones
  (``python -m tq_tpu.evals.compare``).

Improvements over the reference (documented):
  * results flushed after every setting (crash-resumable);
  * batches stream through one jitted SPMD program — batch-sharded over
    the device mesh — instead of ``nn.DataParallel`` replication;
  * works without real ImageNet via deterministic synthetic batches
    (accs are then meaningless but the full pipeline and the exact
    tmacs/avg_terms/params numbers still reproduce).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from tq_tpu.convert import convert_cnn, finalize_cnn, make_cnn_apply, static_conv_layer_settings
from tq_tpu.profilers import cnn_cost, param_count

ARCHS = ("alexnet", "vgg16_bn", "resnet18", "mobilenet_v2", "efficientnet_b0")

# The committed reference script's sweep (evaluate_cnn.py:94-127).
COMMITTED_GRID = dict(
    uq_bits=(6, 7, 8, 9), uq_wt=9, uq_db=9, uq_dt=9,
    tr_data_terms=(2, 3, 4), tr_weight_terms=(12, 16, 20, 24),
)

# Grids reverse-derived from the published results files (see module
# docstring).  resnet18/vgg16_bn quant rows have avg_terms == wb (so the
# run set wt=wb) and tmacs == 8 * wb * macs (so dt'=8; we use db=9, dt=8
# — only min(dt, db) is observable); their TR files carry 5 rows at
# avg_terms {1.0..2.0} (wt in {8..16} at g=8) and only tr-data{2,3}.
PUBLISHED_GRIDS = {
    "resnet18": dict(
        uq_bits=(5, 6, 7, 8, 9), uq_wt="wb", uq_db=9, uq_dt=8,
        tr_data_terms=(2, 3), tr_weight_terms=(8, 10, 12, 14, 16),
    ),
    "vgg16_bn": dict(
        uq_bits=(5, 6, 7, 8, 9), uq_wt="wb", uq_db=9, uq_dt=8,
        tr_data_terms=(2, 3), tr_weight_terms=(8, 10, 12, 14, 16),
    ),
    "mobilenet_v2": dict(COMMITTED_GRID),
    "efficientnet_b0": dict(COMMITTED_GRID),
    "alexnet": dict(COMMITTED_GRID),  # no published file; committed sweep
}


def get_model(arch: str):
    if arch == "resnet18":
        from tq_tpu.models import resnet as m
    elif arch == "vgg16_bn":
        from tq_tpu.models import vgg as m
    elif arch == "alexnet":
        from tq_tpu.models import alexnet as m
    elif arch == "mobilenet_v2":
        from tq_tpu.models import mobilenet as m
    elif arch == "efficientnet_b0":
        from tq_tpu.models import efficientnet as m
    else:
        raise ValueError(f"unknown arch {arch!r}; choose from {ARCHS}")
    return m


def load_params(arch: str, checkpoint: str | None, seed: int = 0):
    """Checkpoint (.pt state_dict or .npz) if given, else random init."""
    m = get_model(arch)
    if checkpoint:
        path = Path(checkpoint)
        if path.suffix == ".npz":
            from tq_tpu.utils.checkpoint import load_params as load_npz

            return m, load_npz(path)
        from tq_tpu.utils.torch_import import load_torch_checkpoint

        return m, load_torch_checkpoint(path)
    import jax

    return m, m.init(jax.random.PRNGKey(seed))


def _batches(arch: str, data_dir, batch_size: int, n_synth: int):
    """Yield (x, y) NHWC val batches; synthetic fallback."""
    from tq_tpu.data.imagenet import find_imagenet_val, iter_imagenet_val
    from tq_tpu.data.synthetic import synthetic_imagenet_batch

    root = find_imagenet_val(data_dir)
    bicubic = "efficientnet" in arch
    if root is not None:
        yield from iter_imagenet_val(root, batch_size, 224, bicubic)
        return
    for i in range(n_synth // batch_size):
        yield synthetic_imagenet_batch(batch_size, 224, seed=i)


def eval_setting(
    m,
    params,
    wb: int,
    gs: int,
    wt: int,
    db: int,
    dt: int,
    arch: str,
    data_dir=None,
    batch_size: int = 64,
    calib_pct: float = 0.05,
    n_synth: int = 512,
    mesh=None,
):
    """One (wb, gs, wt, db, dt) setting -> (acc%, tmacs, avg_terms, params).

    Batches run through ONE jitted SPMD program sharded over the mesh's
    'data' axis (the nn.DataParallel replacement, SURVEY.md §2.4); on a
    single chip the mesh is 1x1 and this degenerates to plain jit.
    """
    from tq_tpu.parallel.mesh import local_mesh
    from tq_tpu.parallel.sharding import shard_batch

    if mesh is None:
        mesh = local_mesh()
    specs = m.conv_specs()
    settings = static_conv_layer_settings(specs, wb, gs, wt)
    tmacs, avg_terms = cnn_cost(specs, settings, db, dt)
    n_params = param_count(params)

    qparams, qcfg, qstate = convert_cnn(m, params, settings, db, dt)

    batches = list(_batches(arch, data_dir, batch_size, n_synth))
    total = sum(len(y) for _, y in batches)
    n_calib = max(1, round(calib_pct * total))

    track_fwd = make_cnn_apply(m, qcfg, track=True)
    seen = 0
    for x, y in batches:
        _, qstate = track_fwd(qparams, qstate, shard_batch(jnp.asarray(x), mesh))
        seen += len(y)
        if seen >= n_calib:
            break
    qstate = finalize_cnn(qstate, qcfg)

    eval_fwd = make_cnn_apply(m, qcfg, track=False)
    # Device-side accumulator: a per-batch int() would host-sync every
    # batch (~30 ms RTT each on the tunneled chip); fetch once at the end.
    correct = jnp.int32(0)
    for x, y in batches:
        logits, _ = eval_fwd(qparams, qstate, shard_batch(jnp.asarray(x), mesh))
        correct = correct + jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(y))
    acc = 100.0 * int(correct) / total
    return acc, tmacs, avg_terms, n_params


def run_sweep(
    arch: str,
    checkpoint: str | None = None,
    data_dir: str | None = None,
    out_file: str | None = None,
    batch_size: int = 64,
    n_synth: int = 512,
    uq_bits=(6, 7, 8, 9),
    uq_wt=9,
    uq_db=9,
    uq_dt=9,
    tr_data_terms=(2, 3, 4),
    tr_weight_terms=(12, 16, 20, 24),
    verbose: bool = True,
):
    m, params = load_params(arch, checkpoint)
    results = {
        key: {"accs": [], "tmacs": [], "avg_terms": [], "params": []}
        for key in ["quant"] + [f"tr-data{d}" for d in tr_data_terms]
    }
    # Crash resume: pick up a partial results file and skip what's done
    # (the reference loses the whole sweep on a crash, SURVEY.md §5).
    done = {key: 0 for key in results}
    if out_file and Path(out_file).exists():
        prior = json.loads(Path(out_file).read_text())
        for key in results:
            if key in prior and prior[key]["accs"]:
                results[key] = prior[key]
                done[key] = len(prior[key]["accs"])

    def record(key, res):
        acc, tmacs, avg_terms, n_params = res
        results[key]["accs"].append(acc)
        results[key]["tmacs"].append(float(tmacs))
        results[key]["avg_terms"].append(avg_terms)
        results[key]["params"].append(float(n_params))
        if verbose:
            print(key, acc, tmacs, avg_terms, n_params, flush=True)
        if out_file:
            Path(out_file).parent.mkdir(parents=True, exist_ok=True)
            with open(out_file, "w") as fp:
                json.dump(results, fp)

    kw = dict(arch=arch, data_dir=data_dir, batch_size=batch_size,
              n_synth=n_synth)
    for i, wb in enumerate(uq_bits):  # evaluate_cnn.py:95-109
        if i < done["quant"]:
            continue
        wt = wb if uq_wt == "wb" else uq_wt
        record("quant", eval_setting(m, params, wb, 1, wt, uq_db, uq_dt, **kw))
    for dt in tr_data_terms:  # evaluate_cnn.py:111-127
        for j, wt in enumerate(tr_weight_terms):
            if j < done[f"tr-data{dt}"]:
                continue
            record(f"tr-data{dt}",
                   eval_setting(m, params, 9, 8, wt, 9, dt, **kw))
    return results


def main(argv=None):
    from tq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="ImageNet CNN UQ/TR sweep")
    ap.add_argument("-a", "--arch", default="resnet18", choices=ARCHS)
    ap.add_argument("--val-dir", default=None,
                    help="dir containing imagenet/val (synthetic if absent)")
    ap.add_argument("--checkpoint", default=None,
                    help=".pt state_dict or .npz params")
    ap.add_argument("-b", "--batch-size", type=int, default=64)
    ap.add_argument("--n-synth", type=int, default=512)
    ap.add_argument("--out-file", default=None)
    ap.add_argument("--grid", default="published",
                    choices=["published", "committed"],
                    help="sweep settings: the published results files' "
                         "grids (default) or the committed script's")
    a = ap.parse_args(argv)
    out = a.out_file or f"results/{a.arch}-results.json"
    grid = (PUBLISHED_GRIDS[a.arch] if a.grid == "published"
            else COMMITTED_GRID)
    run_sweep(a.arch, a.checkpoint, a.val_dir, out, a.batch_size, a.n_synth,
              **grid)


if __name__ == "__main__":
    main()
