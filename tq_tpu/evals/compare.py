"""Compare generated results JSONs against the reference's published ones.

Usage:
    python -m tq_tpu.evals.compare [ours_dir] [reference_dir]

Deterministic columns (tmacs, avg_terms, params/param_bits at g=1) must
match after accounting for the reference's float32 hook-buffer rounding;
data-dependent columns (accs/ppls, compressed-HESE param_bits) are
reported but only comparable when real datasets + checkpoints were used.
Documented divergences (PARITY.md) are annotated.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _f32(xs):
    return [float(np.float32(v)) for v in xs]


def _cmp_seq(name, ours, ref, exact=True):
    n = min(len(ours), len(ref))
    if n == 0:
        return f"  {name}: (no overlap)"
    a, b = _f32(ours[:n]), _f32(ref[:n])
    if a == b:
        return f"  {name}: MATCH ({n} values)"
    rel = max(abs(x - y) / max(abs(y), 1e-12) for x, y in zip(a, b))
    tag = "MATCH(f32-ulp)" if rel < 1e-6 else (
        "mismatch" if exact else "differs (data-dependent)")
    return f"  {name}: {tag} max rel {rel:.2e} ({n} values)"


# Published files whose sweep settings differ from the committed scripts
# (SURVEY.md §3 bit-rot notes + PARITY.md): value-by-value comparison is
# apples-to-oranges there even though the MAC tables agree exactly
# (tests/test_cnn_models.py derives every published value from our spec
# tables at the *published* runs' settings).
KNOWN_DIVERGENCES = {
    "resnet18-results.json":
        "published run used wb in {5..9}, wt=wb, dt'=8 (quant) and "
        "wt in {8,10,12,14,16} (TR); committed script sweeps differ",
    "vgg16_bn-results.json":
        "published run used wb in {5..9}, wt=wb, dt'=8; committed "
        "script sweeps differ",
    "mobilenet_v2-results.json":
        "published TR rows include depthwise convs at 16 terms "
        "(older counter revision); committed hook excludes them — "
        "offset = dt * 16 * 20,716,416 exactly",
}


def compare_file(ours_path: Path, ref_path: Path) -> list[str]:
    ours = json.loads(ours_path.read_text())
    ref = json.loads(ref_path.read_text())
    out = [f"{ours_path.name}:"]
    if ours_path.name in KNOWN_DIVERGENCES:
        out.append(f"  NOTE: {KNOWN_DIVERGENCES[ours_path.name]}")
    if "tmacs" in ours:  # MLP/LSTM flat schema
        out.append(_cmp_seq("tmacs", ours["tmacs"], ref["tmacs"]))
        metric = "ppls" if "ppls" in ours else "accs"
        out.append(_cmp_seq(metric, ours[metric], ref[metric], exact=False))
        out.append(_cmp_seq("param_bits", ours["param_bits"],
                            ref["param_bits"], exact=False))
        return out
    for key in ref:  # CNN / group-size nested schema
        if key not in ours:
            out.append(f"  {key}: missing")
            continue
        for col in ("tmacs", "avg_terms"):
            if col in ref[key]:
                out.append(_cmp_seq(f"{key}.{col}", ours[key][col],
                                    ref[key][col]))
        if "accs" in ref[key]:
            out.append(_cmp_seq(f"{key}.accs", ours[key]["accs"],
                                ref[key]["accs"], exact=False))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ours", nargs="?", default="results")
    ap.add_argument("reference", nargs="?",
                    default="/root/reference/results")
    a = ap.parse_args(argv)
    ours_dir, ref_dir = Path(a.ours), Path(a.reference)
    if not ref_dir.is_dir():
        print(f"reference results not found at {ref_dir}")
        return
    for ref_path in sorted(ref_dir.glob("*.json")):
        ours_path = ours_dir / ref_path.name
        if not ours_path.exists():
            print(f"{ref_path.name}: not generated here")
            continue
        print("\n".join(compare_file(ours_path, ref_path)))


if __name__ == "__main__":
    main()
