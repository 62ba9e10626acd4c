"""tq_tpu — a TPU-native term-quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
"Term Quantization / Term Revealing" research framework
(reference: BradMcDanel/term-quantization):

  * uniform quantization + HESE (hybrid encoding of signed expressions)
    signed power-of-two term decomposition,
  * group-wise top-alpha term budgeting ("term revealing"),
  * two-phase histogram/MSE activation calibration,
  * model conversion for MLP / LSTM / CNN families,
  * a term-pair-operation efficiency model,
  * data/tensor-parallel execution over TPU meshes.

Design notes
------------
The reference implements term revealing as a CUDA fake-quantization kernel
(`kernels/tr_cuda_kernel.cu`) driven by PyTorch module wrappers
(`tr_layer.py`).  Here the same semantics are expressed as static-shaped
bit-plane arithmetic (see `tq_tpu.ops.hese`) which XLA fuses onto the VPU,
with Pallas kernels for the hot paths, and plain MXU matmuls/convs consuming
the fake-quantized values.  Nothing is ported line-by-line; the reference is
used as a behavioural specification only (citations in docstrings are
`file:line` into the reference checkout for parity checking).
"""

__version__ = "0.1.0"

from tq_tpu.ops.term_reveal import (
    term_reveal,
    term_reveal_elementwise,
    term_reveal_elementwise_int,
    term_reveal_st,
    uniform_quantize,
)
from tq_tpu.ops.hese import hese_digit_planes, hese_terms_count

__all__ = [
    "term_reveal",
    "term_reveal_elementwise",
    "term_reveal_elementwise_int",
    "term_reveal_st",
    "uniform_quantize",
    "hese_digit_planes",
    "hese_terms_count",
    "__version__",
]
