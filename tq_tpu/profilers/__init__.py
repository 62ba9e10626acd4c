from tq_tpu.profilers.term_ops import (
    LayerCost,
    conv2d_term_macs,
    dense_term_macs,
    dense_param_bits,
    compressed_hese_bits,
    model_cost,
)

__all__ = [
    "LayerCost",
    "conv2d_term_macs",
    "dense_term_macs",
    "dense_param_bits",
    "compressed_hese_bits",
    "model_cost",
]
