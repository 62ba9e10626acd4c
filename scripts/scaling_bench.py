"""Scaling-efficiency bench: DP throughput across device counts.

North-star harness (BASELINE.json): measure items/s at 1 chip, 1 host,
N hosts and report weak-scaling efficiency.  On a real pod slice this
measures ICI-backed SPMD scaling of the quantized model; in this repo's
CI it runs on XLA's virtual CPU devices (pass --virtual N), which
validates the harness and shardings, not silicon.

Usage:
    python scripts/scaling_bench.py [--virtual 8] [--model mlp|resnet18]
                                    [--per-device-batch 64]

Prints one JSON line per device count:
    {"n_devices": n, "items_per_s": ..., "efficiency": ...}
(efficiency = items/s at n devices / (n * items/s at 1 device)).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (harness validation)")
    ap.add_argument("--model", default="mlp", choices=["mlp", "resnet18"])
    ap.add_argument("--per-device-batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.virtual}"
            ).strip()
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tq_tpu.parallel.multihost import scaling_report

    rng = np.random.default_rng(0)
    if args.model == "resnet18":
        from tq_tpu.convert import (convert_cnn, pack_cnn,
                                    static_conv_layer_settings)
        from tq_tpu.convert.cnn import make_cnn_apply
        from tq_tpu.models import resnet

        params = resnet.init(jax.random.PRNGKey(0))
        settings = static_conv_layer_settings(resnet.conv_specs(), 7, 8, 12)
        qparams, qcfg, qstate = convert_cnn(resnet, params, settings, 7, 3)
        qstate = {k: {**v, "sf": jnp.float32(0.05)}
                  for k, v in qstate.items()}
        qparams = pack_cnn(qparams, qcfg)
        fwd = make_cnn_apply(resnet, qcfg, track=False)

        def model_step(x):
            return fwd(qparams, qstate, x)[0]

        shape = (224, 224, 3)
    else:
        from tq_tpu.models import mlp

        params = mlp.init(jax.random.PRNGKey(0))
        qparams, qcfg, qstate = mlp.convert(
            params, [(4, 16, 12)] * 3, 6, 6, quantize_input=True)
        qstate = {k: {**v, "sf": jnp.float32(0.05)}
                  for k, v in qstate.items()}
        fwd = mlp.make_quantized_apply(qcfg, track=False)

        def model_step(x):
            return fwd(qparams, qstate, x)[0]

        shape = (1, 28, 28)

    all_devices = np.asarray(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devices)]
    base = None
    for n in counts:
        mesh = Mesh(all_devices[:n].reshape(n, 1), ("data", "model"))
        step = jax.jit(
            model_step,
            in_shardings=NamedSharding(mesh, P("data")),
        )

        def make_batch():
            return np.asarray(
                rng.normal(size=(args.per_device_batch * n,) + shape),
                np.float32)

        rep = scaling_report(step, make_batch, mesh, iters=args.iters)
        if base is None:
            base = rep["items_per_s"]
        eff = rep["items_per_s"] / (n * base)
        row = {
            "n_devices": n,
            "items_per_s": round(rep["items_per_s"], 1),
            "efficiency": round(eff, 3),
        }
        if args.virtual:
            # Virtual devices share one CPU socket: aggregate throughput
            # is fixed, so 'efficiency' trends to 1/n BY CONSTRUCTION.
            # The virtual run validates shardings + harness, not silicon.
            row["note"] = "virtual-cpu: harness validation only"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
