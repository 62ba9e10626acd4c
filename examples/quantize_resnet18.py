"""Example: TR-quantize a ResNet-18 and run calibrated inference.

Walks the full production path: load (or init) params -> per-layer
setting policy -> conversion -> two-phase calibration -> quantized
inference -> efficiency profile.  Works anywhere (synthetic data fills
in when no ImageNet/checkpoint is available).

Usage:
    python examples/quantize_resnet18.py [--checkpoint resnet18.pt]
                                         [--val-dir /data]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tq_tpu.convert import (
    convert_cnn,
    finalize_cnn,
    make_cnn_apply,
    static_conv_layer_settings,
)
from tq_tpu.models import resnet
from tq_tpu.profilers import cnn_cost, param_count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--val-dir", default=None)
    ap.add_argument("--wb", type=int, default=9)
    ap.add_argument("--gs", type=int, default=8)
    ap.add_argument("--wt", type=int, default=12)
    ap.add_argument("--dt", type=int, default=3)
    ap.add_argument("--image", type=int, default=224,
                    help="input resolution (small values for smoke runs)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from tq_tpu.evals.cnn import _batches, load_params

    m, params = load_params("resnet18", args.checkpoint)

    # 1. Policy: stem/depthwise/SE exempt, everything else at the sweep
    #    setting (here the reference's headline TR point).
    specs = resnet.conv_specs(args.image)
    settings = static_conv_layer_settings(specs, args.wb, args.gs, args.wt)

    # 2. Efficiency profile — pure arithmetic, no forward needed.
    tmacs, avg_terms = cnn_cost(specs, settings, 9, args.dt)
    print(f"term-pair MACs/img: {tmacs:,}  avg terms/value: {avg_terms}")
    print(f"params: {param_count(params):,}")

    # 3. Convert (weights term-revealed once, grouped along input chans).
    qparams, qcfg, qstate = convert_cnn(m, params, settings, 9, args.dt,
                                        image=args.image)

    # 4. Phase 1: calibration (activation histograms).
    track = make_cnn_apply(m, qcfg, track=True)
    if args.val_dir:
        for x, y in _batches("resnet18", args.val_dir, 32, n_synth=64):
            _, qstate = track(qparams, qstate, jnp.asarray(x))
            break  # ~5% of val in real runs
    else:
        x = np.random.default_rng(1).normal(
            size=(args.batch, args.image, args.image, 3))
        _, qstate = track(qparams, qstate, jnp.asarray(x, jnp.float32))
    qstate = finalize_cnn(qstate, qcfg)  # MSE scale search per layer

    # 5. Phase 2: quantized inference.  The parity path keeps f32
    #    tensors (the reference's fake-quant structure); pass
    #    compute_dtype=jnp.bfloat16 for the serving mode — every
    #    inter-layer tensor moves at 2 bytes, ~1.2x faster end to end
    #    (PERF.md), same top-1.
    infer = make_cnn_apply(m, qcfg, track=False)
    serve = make_cnn_apply(m, qcfg, track=False, compute_dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(args.batch, args.image, args.image, 3)),
        jnp.float32)
    logits, _ = infer(qparams, qstate, x)
    slogits, _ = serve(qparams, qstate, x)
    print("logits:", logits.shape, "top-1:", jnp.argmax(logits, -1).tolist())
    print("serving-mode top-1 agrees:",
          bool(jnp.all(jnp.argmax(slogits, -1) == jnp.argmax(logits, -1))))


if __name__ == "__main__":
    main()
