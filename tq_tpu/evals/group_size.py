"""Group-size/budget grid search (equivalent of evaluate_group_size.py).

Sweeps g in {1,2,8,16,32} x alpha in {1.0,1.25,1.5,2.0,3.0} at wb=9,
db=9, dt=3 with weight_terms = round(alpha * g)
(evaluate_group_size.py:71-88).  Output schema matches
``results/resnet18-group-size-results.json``:
``{str(g): {"avg_terms": [], "accs": [], "tmacs": []}}``.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from tq_tpu.evals.cnn import ARCHS, eval_setting, load_params

ALPHAS = (1.0, 1.25, 1.5, 2.0, 3.0)
GROUP_SIZES = (1, 2, 8, 16, 32)


def run_grid(arch: str = "resnet18", checkpoint=None, data_dir=None,
             out_file=None, batch_size: int = 64, n_synth: int = 512,
             group_sizes=GROUP_SIZES, alphas=ALPHAS, verbose=True):
    m, params = load_params(arch, checkpoint)
    results = {}
    if out_file and Path(out_file).exists():  # crash resume
        results = json.loads(Path(out_file).read_text())
    for g in group_sizes:
        key = str(g)
        results.setdefault(key, {"avg_terms": [], "accs": [], "tmacs": []})
        done = len(results[key]["accs"])
        for ai, alpha in enumerate(alphas):
            if ai < done:
                continue
            wt = round(alpha * g)
            acc, tmacs, avg_terms, _ = eval_setting(
                m, params, 9, g, wt, 9, 3, arch=arch, data_dir=data_dir,
                batch_size=batch_size, n_synth=n_synth,
            )
            results[key]["accs"].append(acc)
            results[key]["tmacs"].append(float(tmacs))
            results[key]["avg_terms"].append(avg_terms)
            if verbose:
                print(g, wt, acc, tmacs, flush=True)
            if out_file:
                Path(out_file).parent.mkdir(parents=True, exist_ok=True)
                with open(out_file, "w") as fp:
                    json.dump(results, fp)
    return results


def main(argv=None):
    from tq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="TR group-size grid search")
    ap.add_argument("-a", "--arch", default="resnet18", choices=ARCHS)
    ap.add_argument("--val-dir", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("-b", "--batch-size", type=int, default=64)
    ap.add_argument("--n-synth", type=int, default=512)
    ap.add_argument("--out-file", default=None)
    a = ap.parse_args(argv)
    out = a.out_file or f"results/{a.arch}-group-size-results.json"
    run_grid(a.arch, a.checkpoint, a.val_dir, out, a.batch_size, a.n_synth)


if __name__ == "__main__":
    main()
