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


def plot_term_pair_dist(arch="resnet18", checkpoint=None, layer=None,
                        group_size=16, image=64, batch=2,
                        weight_bits=9, data_bits=9,
                        out_file="figures/term_pair_dist.pdf",
                        encoding="binary"):
    """Activation-side panel: distribution of term-pair multiplications
    per partial dot product over groups of ``group_size`` input channels
    (reference figure, term_group_dist.py:101-126).

    Protocol mirrors the reference: convert the model at the unquantized
    TR setting (wb=db=9, terms=bits, g=1 — term_group_dist.py:68-73),
    run a small batch, capture one layer's quantized input, slice the
    first ``group_size`` channels of data and weights, convolve the
    digit-plane expansions (``encoding='binary'`` is the reference's
    ``expand_binary_bits`` statistic; 'hese' counts signed terms), and
    histogram the per-output-position pair counts — the long tail is
    what group-wise top-alpha truncation cuts.
    """
    import jax
    import jax.numpy as jnp

    from tq_tpu.convert import convert_cnn, static_conv_layer_settings
    from tq_tpu.evals.cnn import load_params
    from tq_tpu.layers.quantize import act_quantize
    from tq_tpu.profilers.empirical import (
        capture_activations,
        conv_term_pair_map,
    )
    from tq_tpu.profilers.trace_specs import specs_for

    m, params = load_params(arch, checkpoint)
    specs = specs_for(m, image=image)
    settings = static_conv_layer_settings(specs, weight_bits, 1, weight_bits)
    qparams, qcfg, qstate = convert_cnn(m, params, settings, data_bits,
                                        data_bits, image=image)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, image, image, 3)),
        jnp.float32)
    captured = capture_activations(m, qparams, qstate, qcfg, x)
    eligible = [s.name for s in specs[1:]
                if s.groups == 1 and s.in_ch >= group_size
                and s.name in captured]
    name = layer if layer is not None else eligible[0]
    xin, stride, padding, _ = captured[name]
    tr = qcfg[name]
    sf = qstate[name]["sf"]
    xq = act_quantize(xin, sf, tr.data_bits, tr.data_terms)
    w_q, w_sf = qparams[name]["w"], qparams[name]["w_sf"]
    pair_map = conv_term_pair_map(
        xq[..., :group_size], w_q[:, :, :group_size, :], sf, w_sf,
        tr.data_bits, tr.weight_bits, stride, padding, encoding=encoding)
    counts = np.asarray(pair_map).ravel()
    bc = np.bincount(counts)
    pct = 100.0 * bc / bc.sum()
    long_tail = int(np.arange(len(pct))[np.cumsum(pct) > 99][0])
    theo_max = group_size * (tr.data_bits + 1) * (tr.weight_bits + 1)

    fig, ax = plt.subplots(figsize=(7, 2.8))
    xs = np.arange(len(pct))
    ax.fill_between(xs, pct, color="cornflowerblue", zorder=2)
    ax.plot(xs, pct, "-k", lw=1.5)
    ax.axvline(long_tail, color="r", ls="--", lw=1.5)
    ax.set_title(f"{arch} {name}: term-pair mults per partial dot product "
                 f"(g={group_size})", fontsize=9)
    ax.set_xlabel(f"{encoding} pair multiplications "
                  f"(99% < {long_tail}; theoretical max {theo_max})")
    ax.set_ylabel("frequency (%)")
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file, bbox_inches="tight")
    plt.close(fig)
    return out_file


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-a", "--arch", default="resnet18")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--layer", default=None)
    ap.add_argument("--out", default="figures/term_group_dist.pdf")
    ap.add_argument("--pairs", action="store_true",
                    help="activation-side term-pair distribution panel")
    a = ap.parse_args(argv)
    if a.pairs:
        out = a.out if a.out != "figures/term_group_dist.pdf" \
            else "figures/term_pair_dist.pdf"
        print(plot_term_pair_dist(a.arch, a.checkpoint, a.layer,
                                  out_file=out))
        return
    print(plot(a.arch, a.checkpoint, a.layer, out_file=a.out))


if __name__ == "__main__":
    main()
