"""Per-layer weight quantization error bars (reference visualize/quant_error.py).

For every quantizable conv layer of a model, computes the relative L2
error  ||w - TR(w)|| / ||w||  live (the reference recomputes
quantization the same way, quant_error.py:58-88) at a UQ setting and a
TR setting, and draws grouped bars over layer index.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from tq_tpu.layers.common import TRParams, quantize_weight


def layer_errors(m, params, settings):
    """[(layer_name, rel_err)] for each non-exempt conv under ``settings``."""
    out = []
    for i, spec in enumerate(m.conv_specs()):
        if i == 0 or spec.groups > 1 or spec.is_se:
            continue
        w = params[spec.name]["w"]
        tr = TRParams(*settings)
        wq, _ = quantize_weight(w, tr, axis=2)
        err = float(jnp.linalg.norm(w - wq) / jnp.linalg.norm(w))
        out.append((spec.name, err))
    return out


def plot(arch="resnet18", checkpoint=None,
         uq=(8, 1, 8), tr=(9, 8, 12),
         out_file="figures/quant_error.pdf"):
    from tq_tpu.evals.cnn import load_params

    m, params = load_params(arch, checkpoint)
    e_uq = layer_errors(m, params, uq)
    e_tr = layer_errors(m, params, tr)
    x = np.arange(len(e_uq))
    fig, ax = plt.subplots(figsize=(6.4, 3.0))
    ax.bar(x - 0.2, [e for _, e in e_uq], 0.4,
           label=f"UQ {uq[0]}-bit")
    ax.bar(x + 0.2, [e for _, e in e_tr], 0.4,
           label=f"TR wb={tr[0]} g={tr[1]} wt={tr[2]}")
    ax.set_xlabel("conv layer index")
    ax.set_ylabel("relative weight error")
    ax.set_title(arch)
    ax.legend(fontsize=8)
    Path(out_file).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file)
    plt.close(fig)
    return out_file


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-a", "--arch", default="resnet18")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="figures/quant_error.pdf")
    a = ap.parse_args(argv)
    print(plot(a.arch, a.checkpoint, out_file=a.out))


if __name__ == "__main__":
    main()
