"""Term-pair-operation efficiency model (the reference's thop fork, redone).

The reference counts "term MACs" with runtime forward hooks
(``thop/profile.py:59-128`` + ``profile_model.py:8-49``).  Under jit all
shapes are static, so the counter here is a pure function of layer shapes
and TR settings — no hooks, no dummy forward.

Formulas (must match the reference exactly; they are the published
efficiency numbers):

  conv   (profile_model.py:8-26):
      macs = out_elems * (in_ch / groups) * kh * kw
      term_ops = min(dt, db) * (wt' / g) * macs
      with wt' = min(wt, wb) when g == 1 else wt;
      counted only if in_ch > 3 and groups == 1 (first-layer and
      depthwise convs excluded).
  dense  (profile_model.py:28-46):
      macs = out_elems * in_features; same term conversion; always counted.
  lstm   (profile_model.py:48-49): explicitly a no-op in the reference —
      LSTM cost comes only from its decoder dense layer.  We replicate
      that for parity and additionally provide the true recurrent cost
      (``lstm_recurrent_term_macs``) behind a flag.

  param bits (profile_model.py:42-46, tr_layer.py:57-63):
      g == 1: nelement * weight_bits
      g > 1 : compressed HESE — (ceil(log2(wt)) + 2) bits per term, summed
      over all HESE terms of round(w / w_sf).  (The reference computes the
      term count with a slow scalar Python loop; here it is one vectorized
      call.)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from tq_tpu.layers.common import TRParams
from tq_tpu.ops.hese import hese_terms_count

__all__ = [
    "LayerCost",
    "conv2d_term_macs",
    "dense_term_macs",
    "compressed_hese_bits",
    "dense_param_bits",
    "model_cost",
]


def _effective_terms(tr: TRParams) -> tuple[float, float]:
    """(weight_terms', data_terms') per profile_model.py:17-22,34-39."""
    if tr.group_size == 1:
        wt = min(tr.weight_terms, tr.weight_bits)
    else:
        wt = tr.weight_terms
    dt = min(tr.data_terms, tr.data_bits)
    return wt, dt


def conv2d_term_macs(
    out_elems: int,
    in_ch: int,
    kh: int,
    kw: int,
    tr: TRParams,
    groups: int = 1,
) -> int:
    """Term-pair ops for one conv layer; 0 for excluded layers.

    ``out_elems`` is N*H_out*W_out*C_out.  Exclusion rule
    (profile_model.py:25-26): first conv (in_ch <= 3) and grouped convs
    contribute nothing.
    """
    if in_ch <= 3 or groups != 1:
        return 0
    macs = out_elems * (in_ch // groups) * kh * kw
    wt, dt = _effective_terms(tr)
    return int(dt * (wt / tr.group_size) * macs)


def dense_term_macs(out_elems: int, in_features: int, tr: TRParams) -> int:
    """Term-pair ops for one dense layer (profile_model.py:28-41)."""
    macs = out_elems * in_features
    wt, dt = _effective_terms(tr)
    return int(dt * (wt / tr.group_size) * macs)


def compressed_hese_bits(
    w, w_sf, weight_terms: int, weight_bits: int, merge_hack: bool = False
) -> int:
    """Compressed-HESE storage bits of a quantized weight tensor.

    Reference ``compute_compressed_hese`` (tr_layer.py:57-63): each term
    costs ``ceil(log2(B)) + 2`` bits (exponent index + sign + barrier);
    total = per-term cost * number of HESE terms of ``int(w / w_sf)``.
    NB the parameter the reference names ``weight_terms`` actually
    receives **weight_bits** at its only call site
    (``profile_model.py:44``) — the exponent index addresses one of the
    ``weight_bits`` magnitude positions, so that is also the semantically
    right base.  ``weight_terms`` is accepted here for signature parity
    but unused, matching the reference's observable behaviour.

    ``merge_hack=True`` counts terms with the reference's root-level
    ``hese()`` including its "merging neighbors hack" (tr_layer.py:32-39)
    — the counter the published param_bits columns were produced with;
    ``False`` uses the sound CSD automaton of the CUDA kernel.  See
    :func:`tq_tpu.ops.hese.transition_merge_terms_np`.

    Note the reference truncates toward zero (``.int()``) on the
    *already term-revealed* weights, whose magnitudes are exact multiples
    of ``w_sf`` — so truncation == exact division there.
    """
    exp_bits = math.ceil(math.log2(weight_bits))
    per_term = exp_bits + 2
    q = jnp.abs(jnp.trunc(jnp.asarray(w) / w_sf)).astype(jnp.int32)
    if merge_hack:
        from tq_tpu.ops.hese import transition_merge_terms_np

        nterms = int(np.sum(transition_merge_terms_np(np.asarray(q))))
    else:
        nterms = int(jnp.sum(hese_terms_count(q, weight_bits + 1)))
    return per_term * nterms


def dense_param_bits(w, w_sf, tr: TRParams, merge_hack: bool = False) -> int:
    """Weight storage bits for a dense layer (profile_model.py:42-46)."""
    if tr.group_size == 1:
        return int(np.prod(np.asarray(w).shape)) * tr.weight_bits
    return compressed_hese_bits(
        w, w_sf, tr.weight_terms, tr.weight_bits, merge_hack=merge_hack
    )


@dataclasses.dataclass(frozen=True)
class LayerCost:
    """Shape record for one countable layer of a model."""

    kind: str  # 'dense' | 'conv' | 'lstm'
    name: str
    out_elems: int
    in_features: int  # in_ch for conv
    kh: int = 1
    kw: int = 1
    groups: int = 1
    weight_numel: int = 0  # for g=1 dense param bits without the array


def model_cost(
    layers: Iterable[tuple[LayerCost, TRParams]],
    weights: Optional[dict] = None,
    scales: Optional[dict] = None,
    merge_hack: bool = False,
) -> tuple[int, int]:
    """(term_macs, param_bits) over a converted model.

    ``weights``/``scales`` (name -> quantized weight / w_sf) are needed
    only for the compressed-HESE parameter-bit term of grouped dense
    layers; conv layers contribute no parameter bits in the reference
    counter, matching ``tr_conv2d_ops`` (profile_model.py:8-26).
    """
    tmacs = 0
    pbits = 0
    for lc, tr in layers:
        if lc.kind == "conv":
            tmacs += conv2d_term_macs(
                lc.out_elems, lc.in_features, lc.kh, lc.kw, tr, lc.groups
            )
        elif lc.kind == "dense":
            tmacs += dense_term_macs(lc.out_elems, lc.in_features, tr)
            if tr.group_size == 1:
                pbits += lc.weight_numel * tr.weight_bits
            elif weights is not None and lc.name in weights:
                pbits += compressed_hese_bits(
                    weights[lc.name], scales[lc.name], tr.weight_terms,
                    tr.weight_bits, merge_hack=merge_hack,
                )
        elif lc.kind == "lstm":
            # tr_lstm_ops is a no-op in the reference (profile_model.py:48-49)
            pass
    return tmacs, pbits


def cnn_cost(
    specs,
    settings,
    data_bits: int,
    data_terms: int,
) -> tuple[int, float]:
    """(tmacs, avg_terms) for a converted CNN, batch 1.

    Replicates the reference's ``eval_model`` profile numbers
    (evaluate_cnn.py:20-30): tmacs via the conv hook formula (stem /
    grouped convs contribute zero), ``avg_terms`` = mean alpha over
    ``tr_params[1:]`` (exempt layers included, ``compute_avg_terms``,
    evaluate_cnn.py:13-18).  The third reference field, 'params', is
    :func:`param_count` of the model tree.
    """
    tmacs = 0
    for spec, (wb, gs, wt) in zip(specs, settings):
        tr = TRParams(wb, gs, wt, data_bits, data_terms)
        tmacs += conv2d_term_macs(
            spec.out_elems, spec.in_ch, spec.kh, spec.kw, tr, spec.groups
        )
    alphas = [wt / gs for (_, gs, wt) in settings[1:]]
    avg_terms = sum(alphas) / len(alphas)
    return tmacs, avg_terms


def param_count(params) -> int:
    """Total learnable parameter elements (reference 'params' field).

    Matches torch's ``sum(p.numel() for p in model.parameters())``:
    BN running stats ('mean'/'var') and conversion byproducts ('w_sf')
    are buffers, not parameters, and are excluded.
    """
    import jax

    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = {getattr(k, "key", None) for k in path}
        if keys & {"mean", "var", "w_sf", "hist", "sf"}:
            continue
        total += int(np.prod(np.asarray(leaf).shape))
    return total


def lstm_recurrent_term_macs(
    seq_len: int, batch: int, input_size: int, hidden: int, num_layers: int, tr: TRParams
) -> int:
    """True recurrent-path cost (NOT counted by the reference; extension).

    Per step and layer: 4 gates of (in + hidden) @ hidden MACs.
    """
    wt, dt = _effective_terms(tr)
    total = 0
    for layer in range(num_layers):
        in_sz = input_size if layer == 0 else hidden
        total += seq_len * batch * 4 * hidden * (in_sz + hidden)
    return int(dt * (wt / tr.group_size) * total)
