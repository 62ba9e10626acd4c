from tq_tpu.layers.quantize import (
    CalibConfig,
    histogram_update,
    mse_search_scale,
    act_quantize,
)
from tq_tpu.layers.common import TRParams, quantize_weight, weight_scale

__all__ = [
    "CalibConfig",
    "histogram_update",
    "mse_search_scale",
    "act_quantize",
    "TRParams",
    "quantize_weight",
    "weight_scale",
]
