"""Two-phase activation calibration: histogram tracking + MSE scale search.

Behavioural spec: ``tr_layer.py:78-104`` (``LinearQuantize``) and
``tr_layer.py:43-54`` (``mse_profile``).  Protocol (SURVEY.md §3.1):

  phase 1  a calibration pass runs the model on ~5% of the eval set while
           every activation quantizer accumulates a fixed-range histogram
           (8192 bins over [-50, 50], out-of-range values ignored —
           torch.histc semantics);
  switch   ``finish_tracking`` grid-searches 2048 scale-factor candidates
           in [1e-8, 50], picking the one minimizing histogram-weighted
           MSE of the term-revealed grid points;
  phase 2  activations are fake-quantized per element (group_size=1,
           keep ``data_terms`` largest HESE terms) with the chosen scale.

The reference's search is a 2048-iteration Python loop launching one CUDA
kernel each (the "hot calibration loop"); here it is one jitted, chunked
batch evaluation over all candidates.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from tq_tpu.ops.hese import hese_digit_planes, num_planes

__all__ = [
    "CalibConfig",
    "init_histogram",
    "histogram_update",
    "mse_search_scale",
    "act_quantize",
]


@dataclasses.dataclass(frozen=True)
class CalibConfig:
    """Calibration hyper-parameters (reference values, tr_layer.py:81-84,45)."""

    num_bins: int = 8192
    minv: float = -50.0
    maxv: float = 50.0
    num_candidates: int = 2048
    sf_min: float = 1e-8


def init_histogram(cfg: CalibConfig = CalibConfig()):
    return jnp.zeros((cfg.num_bins,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def histogram_update(hist, x, cfg: CalibConfig = CalibConfig()):
    """Accumulate ``x`` into the fixed-range histogram.

    torch.histc semantics (tr_layer.py:92): values outside [minv, maxv]
    are ignored; the top edge falls in the last bin.
    """
    x = x.reshape(-1)
    width = (cfg.maxv - cfg.minv) / cfg.num_bins
    idx = jnp.floor((x - cfg.minv) / width).astype(jnp.int32)
    valid = (x >= cfg.minv) & (x <= cfg.maxv)
    idx = jnp.clip(idx, 0, cfg.num_bins - 1)
    contrib = jnp.where(valid, 1.0, 0.0)
    return hist + jnp.zeros_like(hist).at[idx].add(contrib)


def _tr_elementwise_vals(x_grid, sf, bits: int, terms: int):
    """term_reveal with g=1 on a 1-D grid, written to vmap cleanly over sf."""
    from tq_tpu.kernels.tr_quantize import max_hese_terms

    maxq = 2**bits - 1
    q = jnp.clip(jnp.floor(jnp.abs(x_grid) / sf + 0.5), 0, maxq).astype(jnp.int32)
    sign = jnp.where(x_grid < 0, -1.0, 1.0)
    if terms >= max_hese_terms(bits):
        # Degenerate budget (every reference UQ row, and the 16-bit
        # exempt setting): no term can ever be dropped, so TR == plain
        # UQ — skip the plane expansion.  At 16-bit calibration this
        # removes ~17 planes x 2048 candidates x 8192 grid points of
        # work from every exempt layer's MSE search (the slow tier's
        # worst line was exactly this, 116 s).
        return sign * q.astype(x_grid.dtype) * sf
    planes = hese_digit_planes(q, bits)  # (N, T)
    absd = jnp.abs(planes)
    incl = jnp.cumsum(absd[..., ::-1], axis=-1)[..., ::-1]  # terms at p' >= p
    keep = (incl <= terms) & (absd > 0)  # rank = incl - 1 < terms
    pow2 = 1 << jnp.arange(num_planes(bits), dtype=jnp.int32)
    outq = jnp.sum(jnp.where(keep, planes, 0) * pow2, axis=-1)
    return sign * outq.astype(x_grid.dtype) * sf


@functools.partial(jax.jit, static_argnames=("bits", "terms", "cfg"))
def mse_search_scale(hist, bits: int, terms: int, cfg: CalibConfig = CalibConfig()):
    """Pick the scale factor minimizing histogram-weighted quantization MSE.

    Reference: ``mse_profile`` (tr_layer.py:43-54) — grid of
    ``num_candidates`` scales in [sf_min, maxv], error evaluated on the
    ``num_bins``-point linspace over [minv, maxv] weighted by the observed
    histogram.  The candidate loop is batched (chunked lax.map of a vmap)
    instead of a Python loop of kernel launches.
    """
    x_grid = jnp.linspace(cfg.minv, cfg.maxv, cfg.num_bins)
    sfs = jnp.linspace(cfg.sf_min, cfg.maxv, cfg.num_candidates)

    def err_for(sf):
        xh = _tr_elementwise_vals(x_grid, sf, bits, terms)
        return jnp.sum(hist * (x_grid - xh) ** 2)

    chunk = 128
    errs = jax.lax.map(
        jax.vmap(err_for), sfs.reshape(-1, chunk)
    ).reshape(-1)
    return sfs[jnp.argmin(errs)]


def act_quantize(x, sf, bits: int, terms: int, use_pallas: bool | None = None):
    """Phase-2 activation fake quantization (g=1, per-element top-terms).

    Equivalent of ``LinearQuantize.forward`` with tracking off
    (tr_layer.py:96-99).  Inside model forwards this is pure
    element-wise int math (``term_reveal_elementwise``) that XLA fuses
    into the surrounding BN/ReLU/conv — no extra HBM round trip, which
    makes the quantized forward nearly free relative to fp32.  Pass
    ``use_pallas=True`` to force the standalone kernel materialization
    (useful when the caller wants the quantized tensor itself).
    """
    from tq_tpu.ops.term_reveal import term_reveal_elementwise

    if use_pallas:
        from tq_tpu.kernels.tr_quantize import tr_quantize

        return tr_quantize(x, sf, bits, 1, terms, axis=-1)
    return term_reveal_elementwise(x, sf, bits, terms)
