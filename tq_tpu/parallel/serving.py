"""Continuous-batching inference runner over a device mesh.

BASELINE.json's north star calls for "continuous batching across hosts"
for the sharded inference path.  The reference has nothing comparable
(its eval loops are synchronous per-batch Python); this module provides
the TPU-native building block: a request queue that packs incoming
examples into fixed-size device batches (static shapes — one compiled
program), pads the tail, shards over the 'data' mesh axis, and returns
per-request results as they complete.

Works with any jitted forward ``f(x) -> y`` whose leading axis is the
batch.  Multi-host deployments run one runner per host over
``jax.make_array_from_process_local_data``-style feeding; in-process it
exercises the same code path on any mesh (tests use the virtual
8-device CPU mesh).
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["BatchRunner"]


@dataclasses.dataclass
class _Pending:
    request_id: int
    example: np.ndarray


class BatchRunner:
    """Packs requests into fixed-size sharded batches and runs them.

    Args:
      forward: jitted ``f(x_batch) -> y_batch`` (leading batch axis).
      mesh: device mesh; batches are sharded over its 'data' axis.
      batch_size: device batch size (multiple of the data-axis size).
      pad_value: fill for the tail batch.
    """

    def __init__(self, forward: Callable, mesh: Mesh, batch_size: int,
                 pad_value: float = 0.0):
        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis "
                f"{mesh.shape['data']}"
            )
        self._forward = forward
        self._sharding = NamedSharding(mesh, P("data"))
        self._batch = batch_size
        self._pad = pad_value
        self._queue: collections.deque[_Pending] = collections.deque()
        self._results: dict[int, Any] = {}
        self._next_id = 0
        self._inflight: list[tuple[list[int], Any]] = []

    def submit(self, example: np.ndarray) -> int:
        """Enqueue one example; returns a request id."""
        rid = self._next_id
        self._next_id += 1
        self._queue.append(_Pending(rid, np.asarray(example)))
        if len(self._queue) >= self._batch:
            self._launch(self._batch)
        return rid

    def _launch(self, n: int):
        take = [self._queue.popleft() for _ in range(n)]
        x = np.stack([p.example for p in take])
        if n < self._batch:  # pad the tail to the compiled batch size
            pad_shape = (self._batch - n,) + x.shape[1:]
            x = np.concatenate(
                [x, np.full(pad_shape, self._pad, x.dtype)])
        xs = jax.device_put(x, self._sharding)
        y = self._forward(xs)  # async dispatch; completion at harvest
        self._inflight.append(([p.request_id for p in take], y))

    def flush(self):
        """Run everything still queued (tail partial batch included)."""
        while len(self._queue) >= self._batch:
            self._launch(self._batch)
        if self._queue:
            self._launch(len(self._queue))

    def harvest(self) -> dict[int, np.ndarray]:
        """Block on in-flight batches; return {request_id: result row}."""
        out = {}
        for rids, y in self._inflight:
            y = np.asarray(jax.block_until_ready(y))
            for i, rid in enumerate(rids):
                out[rid] = y[i]
        self._inflight.clear()
        self._results.update(out)
        return out

    def run_all(self, examples) -> list[np.ndarray]:
        """Convenience: submit everything, flush, return ordered results."""
        rids = [self.submit(e) for e in examples]
        self.flush()
        self.harvest()
        return [self._results[r] for r in rids]
