"""Tensor-parallel term-matmul: Pallas kernel inside shard_map.

The north-star TP path (SURVEY.md §2.4): weights tensor-sharded over the
'model' mesh axis, each device running the fused quantize+matmul kernel
on its shard, XLA scheduling the collectives around the kernel.

Two standard layouts:
  * column-parallel — w sharded on output features, no communication
    (activations replicated in, outputs stay sharded; pair with a
    row-parallel layer downstream);
  * row-parallel — w sharded on input features, x sharded to match,
    one ``psum`` over 'model' after the local matmul.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tq_tpu.kernels.term_matmul import term_matmul

__all__ = ["tp_term_matmul_col", "tp_term_matmul_row"]


def tp_term_matmul_col(x, w, sf, bits: int, num_keep_terms: int, mesh: Mesh):
    """Column-parallel: w (K, N) sharded over N; returns y sharded over N.

    Each device quantizes the full x tile stream and multiplies its
    weight columns — zero collectives; the activation quantization is
    recomputed per shard (cheap relative to the matmul, and it keeps the
    kernel fused on every device).
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, "model"), P()),
        out_specs=P(None, "model"),
        check_rep=False,
    )
    def f(x, w_shard, sf):
        return term_matmul(x, w_shard, sf, bits, num_keep_terms)

    return f(x, w, sf)


def tp_term_matmul_row(x, w, sf, bits: int, num_keep_terms: int, mesh: Mesh):
    """Row-parallel: w (K, N) sharded over K, x sharded over K; one psum.

    NB quantization semantics: activations are quantized per-element
    (group_size=1), so quantizing each K-shard independently is exactly
    the unsharded computation — sharding cannot change any rounding.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "model"), P("model", None), P()),
        out_specs=P(),
        check_rep=False,
    )
    def f(x_shard, w_shard, sf):
        part = term_matmul(x_shard, w_shard, sf, bits, num_keep_terms)
        return jax.lax.psum(part, "model")

    return f(x, w, sf)
