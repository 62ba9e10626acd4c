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
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from tq_tpu.parallel._compat import shard_map

from tq_tpu.kernels.term_matmul import term_matmul

__all__ = ["tp_term_matmul_col", "tp_term_matmul_row",
           "tp_term_matmul_overlap", "tp_term_matmul_col_packed"]


def _local_mm(bits, num_keep_terms, w_is_int, int8, bf16):
    """Per-shard kernel closure; threads w_sf only for packed weights.

    The serving modes compose with TP: int8/int16-packed weight shards
    stream 2-4x less ICI/HBM bytes and (int8 mode) hit the integer MXU.
    """

    def mm(x, w_shard, sf, wsf):
        return term_matmul(x, w_shard, sf, bits, num_keep_terms,
                           int8=int8, bf16=bf16,
                           w_sf=wsf if w_is_int else None)

    return mm


def _wsf_scalar(w_sf):
    return jnp.asarray(1.0 if w_sf is None else w_sf, jnp.float32)


def tp_term_matmul_col(x, w, sf, bits: int, num_keep_terms: int, mesh: Mesh,
                       w_sf=None, int8: bool = False, bf16: bool = False):
    """Column-parallel: w (K, N) sharded over N; returns y sharded over N.

    Each device quantizes the full x tile stream and multiplies its
    weight columns — zero collectives; the activation quantization is
    recomputed per shard (cheap relative to the matmul, and it keeps the
    kernel fused on every device).
    """
    mm = _local_mm(bits, num_keep_terms,
                   jnp.issubdtype(w.dtype, jnp.integer), int8, bf16)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, "model"), P(), P()),
        out_specs=P(None, "model"),
        check_rep=False,
    )
    def f(x, w_shard, sf, wsf):
        return mm(x, w_shard, sf, wsf)

    return f(x, w, sf, _wsf_scalar(w_sf))


def tp_term_matmul_col_packed(x, wp, sf, bits: int, num_keep_terms: int,
                              mesh: Mesh, bf16: bool = True,
                              quantize_x: bool = True):
    """Column-parallel matmul over a 9-bit packed weight matrix.

    ``wp`` is a :class:`~tq_tpu.kernels.term_matmul.PackedWeight8`; its
    magnitude and sign-plane arrays shard over N on the 'model' axis,
    so each device streams only 1/n of the 1.125-bytes/weight stream
    and decodes its shard in VMEM.  Zero collectives (outputs stay
    N-sharded, like :func:`tp_term_matmul_col`).

    This is the scaling story for weight-HBM-bound serving: token-by-
    token generation reads the whole decoder every step (PERF.md
    "Token-by-token generation"), so sharding the packed weights over
    the mesh divides the dominant per-token traffic by the mesh size —
    near-linear tokens/s scaling without sharding the tiny activation.
    ``quantize_x=False`` serves raw-input layers (the reference's
    ``TRLinearLayer`` forward bug) the same way.
    """
    from tq_tpu.kernels.term_matmul import PackedWeight8

    specs = PackedWeight8(
        lo=P(None, "model"), signs=P(None, "model"), w_sf=P())

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), specs, P()),
        out_specs=P(None, "model"),
        check_rep=False,
    )
    def f(x, wp_shard, sf):
        return term_matmul(x, wp_shard, sf, bits, num_keep_terms,
                           bf16=bf16, quantize_x=quantize_x)

    return f(x, wp, sf)


def tp_term_matmul_overlap(x, w, sf, bits: int, num_keep_terms: int,
                           mesh: Mesh, w_sf=None, int8: bool = False,
                           bf16: bool = False):
    """Collective matmul: ring all-gather of x overlapped with compute.

    Layout: x (M, K) sharded over K on 'model'; w (K, N) sharded over N.
    Each device owns one K-block of x and all K-rows of its N-columns.
    Instead of all-gathering x up front (one big collective, then one
    big matmul), the K-blocks travel a ring: every step multiplies the
    block just received against the matching W rows while ``ppermute``
    ships the block onward — XLA schedules the transfer concurrently
    with the MXU work, hiding the ICI latency (the scaling-book
    "collective matmul"; the north star's overlap requirement).
    """
    n = mesh.shape["model"]
    mm = _local_mm(bits, num_keep_terms,
                   jnp.issubdtype(w.dtype, jnp.integer), int8, bf16)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model"), P(), P()),
        out_specs=P(None, "model"),
        check_rep=False,
    )
    def f(x_blk, w_cols, sf, wsf):
        me = jax.lax.axis_index("model")
        kn = x_blk.shape[1]  # K / n
        acc = jnp.zeros((x_blk.shape[0], w_cols.shape[1]), jnp.float32)
        blk = x_blk
        for step in range(n):
            src = (me + step) % n  # owner of the block currently held
            w_rows = jax.lax.dynamic_slice(
                w_cols, (src * kn, 0), (kn, w_cols.shape[1])
            )
            acc = acc + mm(blk, w_rows, sf, wsf)
            if step < n - 1:
                blk = jax.lax.ppermute(
                    blk, "model",
                    [(i, (i - 1) % n) for i in range(n)],
                )
        return acc

    return f(x, w, sf, _wsf_scalar(w_sf))


def tp_term_matmul_row(x, w, sf, bits: int, num_keep_terms: int, mesh: Mesh,
                       w_sf=None, int8: bool = False, bf16: bool = False):
    """Row-parallel: w (K, N) sharded over K, x sharded over K; one psum.

    NB quantization semantics: activations are quantized per-element
    (group_size=1), so quantizing each K-shard independently is exactly
    the unsharded computation — sharding cannot change any rounding.
    """

    mm = _local_mm(bits, num_keep_terms,
                   jnp.issubdtype(w.dtype, jnp.integer), int8, bf16)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "model"), P("model", None), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    def f(x_shard, w_shard, sf, wsf):
        part = mm(x_shard, w_shard, sf, wsf)
        return jax.lax.psum(part, "model")

    return f(x, w, sf, _wsf_scalar(w_sf))
