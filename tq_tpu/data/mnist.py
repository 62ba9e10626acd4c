"""MNIST loader: real idx files when available, synthetic fallback.

The reference pulls MNIST through torchvision (train_mlp.py:97-109).
Here we parse the raw idx(.gz) files directly from ``$TQ_DATA_DIR/MNIST/raw``
(or an explicit path); with no data on disk we fall back to
:func:`tq_tpu.data.synthetic.synthetic_mnist` so every pipeline still runs.
"""

from __future__ import annotations

import gzip
import os
import struct
from pathlib import Path

import numpy as np

from tq_tpu.data.synthetic import synthetic_mnist

__all__ = ["load_mnist", "read_idx"]

_FILES = {
    "train_images": "train-images-idx3-ubyte",
    "train_labels": "train-labels-idx1-ubyte",
    "test_images": "t10k-images-idx3-ubyte",
    "test_labels": "t10k-labels-idx1-ubyte",
}


def read_idx(path: Path) -> np.ndarray:
    """Parse an idx file (optionally gzipped)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        if zero != 0:
            raise ValueError(f"bad idx magic in {path}")
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        dtype = {
            0x08: np.uint8,
            0x09: np.int8,
            0x0B: np.int16,
            0x0C: np.int32,
            0x0D: np.float32,
            0x0E: np.float64,
        }[dtype_code]
        data = np.frombuffer(f.read(), dtype=np.dtype(dtype).newbyteorder(">"))
        return data.reshape(dims)


def _find(root: Path, stem: str) -> Path | None:
    for cand in (root / stem, root / (stem + ".gz")):
        if cand.exists():
            return cand
    return None


def load_mnist(data_dir: str | None = None):
    """((x_train, y_train), (x_test, y_test)); NCHW float32, normalized.

    Looks in ``data_dir``, ``$TQ_DATA_DIR/MNIST/raw`` and
    ``$TQ_DATA_DIR``; falls back to synthetic data (returns a third value
    ``source`` in {'real', 'synthetic'}).
    """
    roots = []
    if data_dir:
        roots += [Path(data_dir), Path(data_dir) / "MNIST" / "raw"]
    env = os.environ.get("TQ_DATA_DIR")
    if env:
        roots += [Path(env) / "MNIST" / "raw", Path(env)]
    for root in roots:
        paths = {k: _find(root, v) for k, v in _FILES.items()}
        if all(paths.values()):
            xtr = read_idx(paths["train_images"]).astype(np.float32) / 255.0
            xte = read_idx(paths["test_images"]).astype(np.float32) / 255.0
            norm = lambda x: ((x - 0.1307) / 0.3081)[:, None, :, :]
            return (
                (norm(xtr), read_idx(paths["train_labels"]).astype(np.int32)),
                (norm(xte), read_idx(paths["test_labels"]).astype(np.int32)),
                "real",
            )
    train, test = synthetic_mnist()
    return train, test, "synthetic"
