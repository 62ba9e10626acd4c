from tq_tpu.data.mnist import load_mnist
from tq_tpu.data.synthetic import synthetic_mnist

__all__ = ["load_mnist", "synthetic_mnist"]
