from tq_tpu.kernels.tr_quantize import tr_quantize
from tq_tpu.kernels.term_matmul import pack_weight_int, term_matmul

__all__ = ["tr_quantize", "term_matmul", "pack_weight_int"]
