from tq_tpu.kernels.tr_quantize import tr_quantize
from tq_tpu.kernels.term_matmul import (
    PackedWeight8,
    pack_weight_int,
    pack_weight_u8s,
    term_matmul,
    unpack_weight_u8s,
)

__all__ = ["tr_quantize", "term_matmul", "pack_weight_int",
           "pack_weight_u8s", "unpack_weight_u8s", "PackedWeight8"]
