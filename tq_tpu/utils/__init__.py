from tq_tpu.utils.checkpoint import save_params, load_params
from tq_tpu.utils.meters import AverageMeter, ProgressMeter

__all__ = ["save_params", "load_params", "AverageMeter", "ProgressMeter"]
