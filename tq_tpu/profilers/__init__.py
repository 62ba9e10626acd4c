from tq_tpu.profilers.term_ops import (
    LayerCost,
    cnn_cost,
    conv2d_term_macs,
    dense_term_macs,
    dense_param_bits,
    compressed_hese_bits,
    model_cost,
    param_count,
)

__all__ = [
    "LayerCost",
    "cnn_cost",
    "conv2d_term_macs",
    "dense_term_macs",
    "dense_param_bits",
    "compressed_hese_bits",
    "model_cost",
    "param_count",
]
