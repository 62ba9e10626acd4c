"""QuantCtx: threads per-layer quantization config/state through a model.

The reference mutates ``nn.Module`` trees in place (``replace_*_layers``)
and stores calibration state on the modules.  Functionally, a converted
model is the *same* apply function plus a context holding, per layer
name: the TRParams, the quantizer state (histogram + scale), and the
phase flag.  Models call :meth:`QuantCtx.conv` / :meth:`QuantCtx.dense`
at every quantizable site; with ``ctx=None`` the call is plain fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from tq_tpu.layers.common import TRParams
from tq_tpu.layers.conv import conv2d, tr_conv_apply
from tq_tpu.layers.linear import tr_dense_apply

__all__ = ["QuantCtx"]


@dataclasses.dataclass
class QuantCtx:
    """Quantization context for one forward pass.

    ``cfg``: name -> TRParams for every converted layer (static under jit
    — the set of names and their TRParams determine the traced program).
    ``state``: name -> {'hist', 'sf'} quantizer state (traced values).
    ``track``: phase-1 histogram accumulation vs phase-2 quantized eval.
    ``out_state`` collects updated state; read it after the forward.
    ``compute_dtype``: optional MXU operand dtype for converted layers
    (e.g. jnp.bfloat16).  The reference evaluates fake-quantized values
    through fp32 cuDNN (tr_layer.py:126) — that is the parity default —
    but quantized operands are low-precision by construction, so bf16
    MXU mode trades <=1-ulp-of-the-grid rounding for ~2x conv
    throughput.  Accumulation stays f32 either way.
    """

    cfg: dict
    state: dict
    track: bool = False
    out_state: dict = dataclasses.field(default_factory=dict)
    compute_dtype: object = None

    def conv(self, name, params, x, stride=(1, 1), padding="SAME", groups=1):
        if self.cfg is None or name not in self.cfg:
            # Unconverted layer (the stem).  In a compute_dtype graph it
            # still runs at that dtype end to end — the serving mode is
            # whole-model bf16 IO, not per-layer.
            dt = self.compute_dtype
            if dt is not None and not self.track:
                y = conv2d(x.astype(dt), params["w"].astype(dt), stride,
                           padding, groups, preferred_element_type=dt)
            else:
                y = conv2d(x, params["w"], stride, padding, groups)
            if params.get("b") is not None:
                y = y + params["b"].astype(y.dtype)
            return y
        y, qs = tr_conv_apply(
            params, self.cfg[name], self.state[name], x, self.track,
            stride, padding, groups, compute_dtype=self.compute_dtype,
        )
        self.out_state[name] = qs
        return y

    def dense(self, name, params, x):
        if self.cfg is None or name not in self.cfg:
            y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
            if params.get("b") is not None:
                y = y + params["b"]
            return y
        y, qs = tr_dense_apply(
            params, self.cfg[name], self.state[name], x, self.track
        )
        self.out_state[name] = qs
        return y


NONE: Optional[QuantCtx] = None


def fp32_ctx() -> QuantCtx:
    """A context with no converted layers (plain fp32 forward)."""
    return QuantCtx(cfg=None, state=None, track=False)
