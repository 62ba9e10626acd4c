"""Run the reference's own torch pipeline with tr_cuda swapped for the
native oracle.

The reference repo at /root/reference is CUDA-only (``tr_layer.py:7``
JIT-compiles a CUDA extension; ``mse_profile`` calls ``.cuda()``).  This
harness imports the reference's *unmodified* Python modules on CPU torch
by shimming exactly three seams:

  * ``torch.utils.cpp_extension.load`` returns an object whose ``tr``
    has the reference kernel's semantics (``kernels/tr_cuda_kernel.cu``)
    via the native C++ oracle (``native/tr_oracle.cpp``), including the
    dim-1 grouping convention (2-D tensors grouped along features, 4-D
    OIHW conv weights grouped along input channels at fixed output
    channel/kernel position, tr_cuda_kernel.cu:80-90);
  * ``torch.Tensor.cuda`` becomes the identity (CPU run);
  * absent dependencies (torchvision, thop, efficientnet_pytorch) are
    stubbed — the parity tests exercise the accuracy pipeline, not the
    op counter (the counter has its own exact-arithmetic tests).

With those seams in place, ``tr_layer``'s calibration state machine,
``evaluate_mlp``'s conversion + two-phase eval, and ``train_mlp.test``
run as committed, giving an executable ground truth that tq_tpu's
pipeline is asserted against on identical weights and identical inputs.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import torch

REFERENCE = Path("/root/reference")

_loaded: dict | None = None


def _shim_tr(tensor, sf, bits, group_size, num_keep_terms):
    """Reference-kernel-semantics ``tr`` on CPU tensors.

    Grouping is along dim 1 (tr_cuda_kernel.cu:80-90): for 2-D (B, C)
    that is C; 4-D (B, C, W, H) groups g consecutive channels at fixed
    (b, w, h).  The native oracle groups along the LAST axis of
    contiguous rows, so 4-D inputs are transposed to channels-last.
    """
    from tq_tpu.utils.native import tr_reveal_native

    x = tensor.detach().cpu().numpy().astype(np.float32)
    transposed = False
    if x.ndim == 4 and x.shape[2] == 1 and x.shape[3] == 1:
        arr = x.reshape(x.shape[0], x.shape[1])
    elif x.ndim == 2:
        arr = x
    elif x.ndim == 4:
        arr = np.transpose(x, (0, 2, 3, 1))  # (B, W, H, C): C contiguous
        transposed = True
    else:
        raise NotImplementedError(f"tr shim: rank-{x.ndim} input")
    row = arr.shape[-1]
    if group_size == 1 or row % group_size == 0:
        # groups never straddle rows -> one flat native call
        out = tr_reveal_native(
            arr.reshape(1, -1), float(sf), int(bits), int(group_size),
            int(num_keep_terms),
        ).reshape(arr.shape)
    else:
        out = tr_reveal_native(
            arr, float(sf), int(bits), int(group_size), int(num_keep_terms)
        )
    if transposed:
        out = np.transpose(out, (0, 3, 1, 2))
    return torch.from_numpy(np.ascontiguousarray(out.reshape(x.shape)))


def _stub(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def load_reference():
    """Import the reference's tr_layer/train_mlp/evaluate_mlp (cached).

    Returns a namespace with the reference modules plus the shimmed
    ``tr_cuda`` object.
    """
    global _loaded
    if _loaded is not None:
        return _loaded

    # CPU torch: .cuda() becomes identity (reference calls it in
    # mse_profile, tr_layer.py:44, and per-layer .to(device) is cpu).
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore

    shim = types.SimpleNamespace(tr=_shim_tr)

    import torch.utils.cpp_extension as cpp_ext

    real_load = cpp_ext.load
    cpp_ext.load = lambda *a, **k: shim

    # Absent-in-env deps used only by paths the tests do not exercise.
    _stub("torchvision", datasets=types.SimpleNamespace(),
          transforms=types.SimpleNamespace())
    _stub("thop", profile=None, clever_format=None)
    _stub("efficientnet_pytorch", EfficientNet=None)
    _stub("efficientnet_pytorch.utils",
          Conv2dStaticSamePadding=type("Conv2dStaticSamePadding", (), {}))

    sys.path.insert(0, str(REFERENCE))
    try:
        import tr_layer  # noqa: F401  (reference module)
        import train_mlp  # noqa: F401
        import evaluate_mlp  # noqa: F401
    finally:
        sys.path.remove(str(REFERENCE))
        cpp_ext.load = real_load

    _loaded = types.SimpleNamespace(
        tr_layer=tr_layer,
        train_mlp=train_mlp,
        evaluate_mlp=evaluate_mlp,
        tr_cuda=shim,
    )
    return _loaded


class FixedLoader:
    """Deterministic (data, target) batch iterator with a .dataset.targets,
    matching what ``train_mlp.test`` (train_mlp.py:44-64) consumes."""

    class _Dataset:
        def __init__(self, targets):
            self.targets = targets

        def __len__(self):
            return len(self.targets)

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int):
        self.x = torch.from_numpy(np.ascontiguousarray(x, np.float32))
        self.y = torch.from_numpy(np.ascontiguousarray(y, np.int64))
        self.batch_size = batch_size
        self.dataset = self._Dataset(self.y)

    def __iter__(self):
        for i in range(0, len(self.y), self.batch_size):
            yield self.x[i : i + self.batch_size], self.y[i : i + self.batch_size]


def torch_mlp_from_npz(npz_path: str):
    """Build the reference MNISTMLP carrying pretrained/mnist_mlp.npz."""
    ref = load_reference()
    from tq_tpu.utils.checkpoint import load_params

    params = load_params(npz_path)
    model = ref.train_mlp.MNISTMLP()
    sd = {}
    for i, name in zip((0, 3, 6), ("fc1", "fc2", "fc3")):
        sd[f"features.{i}.weight"] = torch.from_numpy(
            np.asarray(params[name]["w"]).T.copy()
        )
        sd[f"features.{i}.bias"] = torch.from_numpy(
            np.asarray(params[name]["b"]).copy()
        )
    model.load_state_dict(sd)
    model.eval()
    return model, params
