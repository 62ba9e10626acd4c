"""Per-group term-count distribution (reference visualize/term_group_dist.py).

The reference splices Tracker modules in front of TR layers to capture
live activations, then convolves bit-plane expansions to count term
pairs per group (term_group_dist.py:19-45, 101-110).  Here the same
statistic is a direct computation: uniform-quantize a weight tensor,
HESE-encode (``hese_terms_count``), sum term counts over each group of
``g`` input channels, and histogram — the distribution whose long tail
top-alpha truncation cuts.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from tq_tpu.layers.common import weight_scale
from tq_tpu.ops.hese import hese_terms_count


def group_term_counts(w, weight_bits: int, group_size: int) -> np.ndarray:
    """Per-group HESE term totals of a conv weight (HWIO), grouped along
    the input-channel axis."""
    sf = weight_scale(w, weight_bits)
    q = jnp.round(jnp.abs(w) / sf).astype(jnp.int32)
    counts = hese_terms_count(q, weight_bits + 1)
    moved = jnp.moveaxis(counts, 2, -1)
    n = moved.shape[-1]
    pad = (-n) % group_size
    if pad:
        moved = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(0, pad)])
    grouped = moved.reshape(-1, group_size)
    return np.asarray(jnp.sum(grouped, axis=-1))


def plot(arch="resnet18", checkpoint=None, layer=None, weight_bits=9,
         group_sizes=(1, 8, 16), out_file="figures/term_group_dist.pdf"):
    from tq_tpu.evals.cnn import load_params

    m, params = load_params(arch, checkpoint)
    specs = [s for i, s in enumerate(m.conv_specs())
             if i > 0 and s.groups == 1 and not s.is_se]
    spec = next(s for s in specs if layer is None or s.name == layer)
    w = params[spec.name]["w"]
    fig, axes = plt.subplots(1, len(group_sizes),
                             figsize=(3.4 * len(group_sizes), 2.8))
    for ax, g in zip(np.atleast_1d(axes), group_sizes):
        counts = group_term_counts(w, weight_bits, g)
        ax.hist(counts, bins=range(int(counts.max()) + 2), density=True)
        ax.axvline(counts.mean(), color="k", ls="--", lw=1)
        ax.set_title(f"g={g} (mean {counts.mean():.1f})", fontsize=9)
        ax.set_xlabel("terms per group")
    np.atleast_1d(axes)[0].set_ylabel("frequency")
    fig.suptitle(f"{arch} {spec.name}, {weight_bits}-bit", fontsize=10)
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)
    return out_file


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-a", "--arch", default="resnet18")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--layer", default=None)
    ap.add_argument("--out", default="figures/term_group_dist.pdf")
    a = ap.parse_args(argv)
    print(plot(a.arch, a.checkpoint, a.layer, out_file=a.out))


if __name__ == "__main__":
    main()
