"""Flat-npz checkpointing for param/state pytrees.

The reference's checkpoint story is ad-hoc (state_dict for the MLP,
whole-model pickle for the LSTM — SURVEY.md §5).  Here every pytree of
arrays round-trips through a flat .npz keyed by '/'-joined paths: simple,
portable, and safe (no pickled code).  Calibration state (histograms,
scale factors) checkpoints the same way, making sweep settings resumable.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

__all__ = ["save_params", "load_params", "flatten_tree", "unflatten_tree"]


def _namedtuple_class(name: str):
    """Registry of NamedTuple node types that may appear in checkpoints
    (no pickled code: the class is resolved by name at load time)."""
    if name == "PackedWeight8":
        from tq_tpu.kernels.term_matmul import PackedWeight8

        return PackedWeight8
    raise KeyError(f"unknown checkpointed namedtuple type {name!r}")


def flatten_tree(tree, prefix=""):
    """Pytree -> {'path/to/leaf': np.ndarray}.  Lists use numeric keys;
    NamedTuple nodes (e.g. packed-weight containers) keep their type via
    a '#nt' marker leaf so they round-trip as the same class."""
    out = {}
    if hasattr(tree, "_fields"):  # NamedTuple node
        out[f"{prefix}#nt"] = np.asarray(type(tree).__name__)
        for k in tree._fields:
            out.update(flatten_tree(getattr(tree, k), f"{prefix}{k}/"))
    elif isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    elif tree is None:
        out[prefix.rstrip("/") + "#none"] = np.zeros(0)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict):
    """Inverse of :func:`flatten_tree` (lists come back as dicts with
    numeric string keys converted to lists when contiguous)."""
    root: dict = {}
    for path, val in flat.items():
        if path.endswith("#none"):
            path, val = path[: -len("#none")], None
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if "#nt" in node:
            cls = _namedtuple_class(str(node.pop("#nt")))
            return cls(**node)
        if node and all(k.isdigit() for k in node):
            idxs = sorted(int(k) for k in node)
            if idxs == list(range(len(idxs))):
                return [node[str(i)] for i in idxs]
        return node

    return listify(root)


def save_params(path: str | Path, tree, store_dtype=None, meta=None):
    """``store_dtype=np.float16`` halves on-disk size for distribution
    checkpoints (committed demo weights); float leaves are narrowed at
    save and widened back to float32 by :func:`load_params` — storage
    dtype, not compute dtype.  A ``__meta__/store_dtype`` marker records
    which convention applies, so checkpoints whose params are GENUINELY
    float16 (compute dtype) round-trip unchanged (ADVICE r4 #5).

    ``meta``: optional {str: str} side-channel (e.g. ``{'cell': 'GRU',
    'nonlinearity': 'relu'}`` — the model-family facts shapes can't
    recover, ADVICE r4 #1); read back via ``load_params(with_meta=True)``.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = flatten_tree(jax.device_get(tree))
    if any(k == "__meta__" or k.startswith("__meta__/") for k in flat):
        # Reserved namespace: load_params diverts these keys into the
        # meta dict, which would silently strip the branch from the
        # round-tripped tree — fail loudly at save time instead.
        raise ValueError(
            "param tree uses the reserved '__meta__' key; rename the "
            "branch or pass the data via the meta= argument"
        )
    if store_dtype is not None:
        flat = {k: (v.astype(store_dtype)
                    if np.issubdtype(v.dtype, np.floating) else v)
                for k, v in flat.items()}
    flat["__meta__/store_dtype"] = np.asarray(
        np.dtype(store_dtype).name if store_dtype is not None else "none")
    for k, v in (meta or {}).items():
        flat[f"__meta__/{k}"] = np.asarray(str(v))
    np.savez(path, **flat)


def load_params(path: str | Path, with_meta: bool = False):
    """Load a :func:`save_params` checkpoint.

    Narrowed-storage floats (``store_dtype`` convention) widen back to
    float32; genuinely-float16 params (marker ``'none'``) keep their
    dtype.  Legacy checkpoints without the marker widen float16 — the
    pre-marker save convention.  ``with_meta=True`` also returns the
    ``meta`` dict (always includes ``store_dtype``; empty for legacy
    files)."""
    with np.load(Path(path), allow_pickle=False) as z:
        meta = {k[len("__meta__/"):]: str(z[k])
                for k in z.files if k.startswith("__meta__/")}
        narrowed = meta.get("store_dtype", "float16")  # legacy: widen
        flat = {k: (z[k].astype(np.float32)
                    if z[k].dtype == np.float16 and narrowed == "float16"
                    else z[k])
                for k in z.files if not k.startswith("__meta__/")}
    tree = unflatten_tree(flat)
    return (tree, meta) if with_meta else tree


def save_params_orbax(path: str | Path, tree):
    """Orbax backend for sharded / large checkpoints.

    npz round-trips host arrays; for multi-host or model-parallel
    params (sharded jax.Arrays) orbax writes each shard from its owner
    process.  Use this on pods, npz everywhere else.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), tree, force=True)


def load_params_orbax(path: str | Path, like=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(Path(path).resolve(), like)
        return ckptr.restore(Path(path).resolve())
