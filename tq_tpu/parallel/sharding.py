"""Sharding rules: PartitionSpecs for params and batches.

Tensor-parallel layout for dense stacks follows the standard two-matmul
pattern: odd layers shard the *output* features, even layers shard the
*input* features, so the pair needs exactly one ``psum`` (inserted by
GSPMD) and activations stay sharded in between.  Batches shard on
'data'.  This replaces the reference's replicate-everything
``nn.DataParallel`` (evaluate_cnn.py:33) with true SPMD.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["mlp_param_specs", "batch_spec", "shard_pytree"]


def mlp_param_specs(layer_names=("fc1", "fc2", "fc3")) -> dict:
    """Megatron-style specs for the MLP parameter pytree.

    fc1 column-parallel (shard out features), fc2 row-parallel (shard in
    features, output psum), final logits layer replicated (10 classes is
    far below the lane tile).  Works for any TRParams-converted pytree:
    extra leaves ('w_sf') are replicated.
    """
    specs = {}
    for i, name in enumerate(layer_names):
        last = i == len(layer_names) - 1
        if last:
            w, b = P(None, None), P(None)
        elif i % 2 == 0:
            w, b = P(None, "model"), P("model")
        else:
            w, b = P("model", None), P(None)
        specs[name] = {"w": w, "b": b}
    return specs


def batch_spec() -> P:
    """Leading-axis batch sharding over the 'data' mesh axis."""
    return P("data")


def cnn_param_specs(params) -> dict:
    """TP specs for a CNN param tree: conv kernels (HWIO) shard their
    output channels over 'model', dense layers their output features;
    BN / biases / scalars replicate.  GSPMD then partitions every conv
    over output channels and all-gathers activations where needed.
    """
    specs = {}
    for name, leaves in params.items():
        if not isinstance(leaves, dict):
            continue
        entry = {}
        for key, leaf in leaves.items():
            ndim = getattr(leaf, "ndim", 0)
            if key == "w" and ndim == 4:
                entry[key] = P(None, None, None, "model")
            elif key == "w" and ndim == 2:
                entry[key] = P(None, "model")
            else:
                entry[key] = P()
        specs[name] = entry
    return specs


def shard_batch(x, mesh: Mesh, axis: int = 0):
    """device_put ``x`` batch-sharded over 'data' (replicated when the
    batch does not divide the axis — e.g. a tail batch).  ``axis``
    selects which dim is the batch (time-major LM streams are (T, B):
    axis=1)."""
    n = mesh.shape["data"]
    if x.shape[axis] % n == 0:
        spec = P(*(("data" if i == axis else None)
                   for i in range(axis + 1)))
    else:
        spec = P()
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_pytree(tree, specs, mesh: Mesh):
    """Device-put ``tree`` with per-leaf PartitionSpecs.

    ``specs`` may be a prefix pytree; missing leaves (e.g. scalar
    'w_sf' / histogram state) are replicated.
    """

    def place(path, leaf):
        spec = specs
        for key in path:
            if isinstance(spec, dict) and getattr(key, "key", None) in spec:
                spec = spec[key.key]
            else:
                spec = None
                break
        if not isinstance(spec, P):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
