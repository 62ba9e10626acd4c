"""Torch/torchvision checkpoint import into tq_tpu param pytrees.

The reference obtains its CNNs pre-trained from torchvision /
efficientnet_pytorch (``cnn_models/__init__.py:6-25``) and its MLP/LSTM
from saved torch checkpoints (``pretrained_models/README.md``).  This
module converts a ``state_dict`` (or anything exposing ``.items()`` of
name -> tensor/ndarray) into the flat-name param pytrees our functional
models use:

  conv    OIHW  ->  HWIO  (transpose 2,3,1,0)
  linear  (out, in) -> (in, out)
  bn      weight/bias/running_mean/running_var -> scale/bias/mean/var
  lstm    weight_ih_l{k}: (4H, in) -> (in, 4H)   (gate order i,f,g,o kept)

No torch import is required unless the input is a ``.pt`` file.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["from_state_dict", "load_torch_checkpoint"]


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def from_state_dict(state_dict, rename=None) -> dict:
    """Convert a torch ``state_dict`` into a flat {module: {leaf: array}} tree.

    ``rename``: optional callable mapping torch module prefixes to our
    layer names (e.g. efficientnet_pytorch's ``_conv_stem`` ->
    ``conv_stem``).  Buffers like ``num_batches_tracked`` are dropped.
    """
    items = {k: v for k, v in state_dict.items()}
    modules: dict[str, dict] = {}
    for key, val in items.items():
        if key.endswith("num_batches_tracked"):
            continue
        prefix, _, leaf = key.rpartition(".")
        modules.setdefault(prefix, {})[leaf] = _np(val)

    out = {}
    for prefix, leaves in modules.items():
        name = rename(prefix) if rename else prefix
        if "running_mean" in leaves:  # batch norm
            out[name] = {
                "scale": leaves.get("weight", np.ones_like(leaves["running_mean"])),
                "bias": leaves.get("bias", np.zeros_like(leaves["running_mean"])),
                "mean": leaves["running_mean"],
                "var": leaves["running_var"],
            }
        elif "weight_ih_l0" in leaves or any(
            k.startswith("weight_ih_l") for k in leaves
        ):  # torch nn.LSTM flattens all layers into one module
            n_layers = sum(1 for k in leaves if k.startswith("weight_ih_l"))
            out[name] = [
                {
                    "w_ih": leaves[f"weight_ih_l{i}"].T,
                    "w_hh": leaves[f"weight_hh_l{i}"].T,
                    "b_ih": leaves[f"bias_ih_l{i}"],
                    "b_hh": leaves[f"bias_hh_l{i}"],
                }
                for i in range(n_layers)
            ]
        elif "weight" in leaves and leaves["weight"].ndim == 4:  # conv
            p = {"w": leaves["weight"].transpose(2, 3, 1, 0)}
            if "bias" in leaves:
                p["b"] = leaves["bias"]
            out[name] = p
        elif "weight" in leaves and leaves["weight"].ndim == 2:  # linear / embed
            p = {"w": leaves["weight"].T}
            if "bias" in leaves:
                p["b"] = leaves["bias"]
            out[name] = p
        elif "weight" in leaves:  # 1-D affine (layernorm w/o stats)
            out[name] = {
                "scale": leaves["weight"],
                "bias": leaves.get("bias", np.zeros_like(leaves["weight"])),
            }
        else:
            out[name] = leaves
    return out


def load_torch_checkpoint(path: str | Path, rename=None) -> dict:
    """Load a ``.pt``/``.pth`` file (state_dict or whole pickled module)."""
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return from_state_dict(obj, rename=rename)
