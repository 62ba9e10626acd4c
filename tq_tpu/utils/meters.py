"""Progress meters + accuracy (equivalent of util.py:83-133)."""

from __future__ import annotations

__all__ = ["AverageMeter", "ProgressMeter", "accuracy"]


def accuracy(output, target, topk=(1,)):
    """Top-k accuracies in percent (util.py:124-133).

    ``output``: (N, C) scores; ``target``: (N,) labels.  Returns one
    float per k.
    """
    import jax.numpy as jnp

    maxk = max(topk)
    n = output.shape[0]
    # top-maxk predictions per row, descending score
    pred = jnp.argsort(output, axis=1)[:, ::-1][:, :maxk]
    correct = pred == target[:, None]
    return [
        float(100.0 * jnp.sum(correct[:, :k]) / n) for k in topk
    ]


class AverageMeter:
    """Running average of a scalar (util.py:83-104)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})").format(
            **self.__dict__
        )


class ProgressMeter:
    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.num_batches = num_batches
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        line = [f"{self.prefix}[{batch}/{self.num_batches}]"]
        line += [str(m) for m in self.meters]
        print("\t".join(line))
