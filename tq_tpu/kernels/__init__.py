from tq_tpu.kernels.tr_quantize import tr_quantize

__all__ = ["tr_quantize"]
