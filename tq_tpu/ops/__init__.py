from tq_tpu.ops.hese import (
    binary_digit_planes,
    hese_digit_planes,
    hese_terms_count,
)
from tq_tpu.ops.term_reveal import (
    term_reveal,
    term_reveal_elementwise,
    term_reveal_elementwise_int,
    term_reveal_st,
    uniform_quantize,
)

__all__ = [
    "binary_digit_planes",
    "hese_digit_planes",
    "hese_terms_count",
    "term_reveal",
    "term_reveal_elementwise",
    "term_reveal_elementwise_int",
    "term_reveal_st",
    "uniform_quantize",
]
