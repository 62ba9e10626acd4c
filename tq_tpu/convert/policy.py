"""Per-layer TR setting policy (reference cnn_models/__init__.py:52-65).

``static_conv_layer_settings`` walks the model's conv layers in
definition order and assigns every layer the sweep's (weight_bits,
group_size, weight_terms) — except three exemption classes that get the
near-lossless (16, 1, 16) setting:

  * the stem (first conv, raw-pixel input),
  * depthwise / grouped convs (``layer.groups > 1``),
  * squeeze-excite convs (``'se' in name``).

The reference *replaces* every conv but the stem (the stem keeps its
fp32 module, ``replace_conv_layers``, ``cnn_models/__init__.py:33-36``);
since an exempt TR layer at (16,1,16) is numerically ~lossless but the
op counter also skips stem/depthwise (``profile_model.py:25-26``), we
reproduce the same observable behaviour by leaving the stem unconverted
and exempting the rest.
"""

from __future__ import annotations

from typing import Sequence

from tq_tpu.models.cnn_common import ConvSpec

EXEMPT_SETTING = (16, 1, 16)

__all__ = ["static_conv_layer_settings", "EXEMPT_SETTING"]


def static_conv_layer_settings(
    specs: Sequence[ConvSpec],
    weight_bits: int,
    group_size: int,
    num_terms: int,
) -> list[tuple[int, int, int]]:
    """(weight_bits, group_size, weight_terms) per conv spec, in order."""
    out = []
    for i, spec in enumerate(specs):
        if i == 0 or spec.groups > 1 or spec.is_se:
            out.append(EXEMPT_SETTING)
        else:
            out.append((weight_bits, group_size, num_terms))
    return out
