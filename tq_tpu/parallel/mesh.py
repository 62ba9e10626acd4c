"""Device-mesh construction for data/tensor-parallel execution.

The reference's entire distribution story is single-host
``nn.DataParallel`` (evaluate_cnn.py:33) — replicate the model, scatter
the batch.  The TPU-native replacement (SURVEY.md §2.4): one
``jax.sharding.Mesh`` over the slice's chips with named axes

    'data'   — batch sharding (DP; the DataParallel equivalent)
    'model'  — weight sharding (TP; new capability)

and ``jit``-compiled programs whose in/out shardings are
``NamedSharding``s over that mesh; XLA/GSPMD inserts all collectives
(all-gather / reduce-scatter / psum) over ICI.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "local_mesh"]


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (default: all) devices.

    With ``n_data=None`` the data axis absorbs every device not used by
    the model axis.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n_data is None:
        if n % n_model:
            raise ValueError(f"{n} devices not divisible by n_model={n_model}")
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {n}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def local_mesh(max_devices: int | None = None) -> Mesh:
    """A pure-DP mesh over the local devices (single-chip: a 1x1 mesh).

    Every entry point works unchanged from 1 chip to a pod slice.
    """
    devices = jax.devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    return make_mesh(n_data=len(devices), n_model=1, devices=devices)
