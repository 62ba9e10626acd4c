from tq_tpu.kernels.tr_quantize import tr_quantize
from tq_tpu.kernels.term_matmul import term_matmul

__all__ = ["tr_quantize", "term_matmul"]
