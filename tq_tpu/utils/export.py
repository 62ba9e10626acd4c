"""StableHLO serialization of quantized serving programs.

The reference exports its trained LM to ONNX as the deployable artifact
(``lstm_models/main.py:196-202,248-250``, ``--onnx-export``).  The
TPU-native equivalent is :mod:`jax.export`: the jitted (quantized)
forward — weights closed over as constants, exactly like ONNX
initializers — serializes to portable StableHLO bytes that reload and
execute with no model-building code, no Python pytrees, and no
framework version skew (StableHLO carries its own compatibility
guarantees).

Two artifact shapes:

* a *step* (``fn(tok, hidden) -> (logp, hidden)`` or the Transformer's
  ``fn(tok, pos, cache) -> (logp, cache)``) — composable, the serving
  runtime owns the loop;
* a whole *sampler scan* — one program generates N tokens on device.

Both are produced by :func:`export_serving`, which handles either a
concrete example call (shapes taken from real arrays) or explicit
``jax.ShapeDtypeStruct`` specs.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

__all__ = ["export_serving", "load_serving", "export_lm_step"]


def _spec(a):
    if isinstance(a, jax.ShapeDtypeStruct):
        return a
    a = jnp.asarray(a)
    return jax.ShapeDtypeStruct(a.shape, a.dtype)


def export_serving(fn, example_args, path: str | Path | None = None,
                   platforms=None) -> bytes:
    """Serialize ``jit(fn)`` at ``example_args``' shapes to StableHLO.

    ``fn``: a python callable (jitted or not) whose non-array closure
    (weights, scales, configs) is embedded as constants.
    ``example_args``: pytree of arrays / ShapeDtypeStructs fixing the
    input signature.  ``platforms``: e.g. ``("cpu", "tpu")`` for a
    multi-platform artifact (default: the current backend only).
    NB: export multi-platform artifacts from a CPU process — on the
    TPU backend the quantized forwards route through Pallas kernels,
    which have no CPU lowering (the single-platform TPU artifact keeps
    the kernels and is the fast serving choice).
    Returns the serialized bytes; also writes them to ``path``.
    """
    specs = jax.tree.map(_spec, tuple(example_args))
    exp = jax.export.export(jax.jit(fn), platforms=platforms)(*specs)
    data = bytes(exp.serialize())  # serialize() returns a bytearray
    if path is not None:
        Path(path).write_bytes(data)
    return data


def load_serving(src: str | Path | bytes):
    """bytes / file -> the rehydrated callable (``Exported.call``).

    The callable runs under the standard JAX dispatch (jit-compatible,
    shardable); inputs must match the exported signature exactly.
    """
    data = src if isinstance(src, bytes) else Path(src).read_bytes()
    return jax.export.deserialize(data).call


def export_lm_step(qparams, qcfg, qstate, path: str | Path | None = None,
                   batch: int = 1, nhid: int | None = None,
                   platforms=None) -> bytes:
    """Export the quantized recurrent-LM serving step.

    The artifact is ``step(tok (1, B) int32, hidden) -> (logp, hidden)``
    with the (optionally packed) weights and calibrated scales embedded
    — the reference's ``--onnx-export`` deployable, TPU-native
    (main.py:196-202).  Round-trip exactness is pinned by
    ``test_export.py``.
    """
    from tq_tpu.models import lstm_lm

    cell = qcfg.get("cell", "LSTM")
    fwd = lstm_lm.make_quantized_apply(qcfg, track=False)

    def step(tok, hidden):
        logp, hidden, _ = fwd(qparams, qstate, tok, hidden)
        return logp, hidden

    if nhid is None:
        w_hh = qparams["rnn"][0]["w_hh"]
        # Packed recurrent weights store (in, G*H) in integer planes;
        # hidden size comes from the gate width regardless of format.
        from tq_tpu.kernels.term_matmul import PackedWeight8
        from tq_tpu.layers.lstm import GATE_MULT

        n = (w_hh.lo.shape[1] if isinstance(w_hh, PackedWeight8)
             else w_hh.shape[1])
        nhid = n // GATE_MULT[cell]
    hidden0 = lstm_lm.init_hidden(batch, nhid=nhid,
                                  nlayers=len(qparams["rnn"]), cell=cell)
    tok0 = jnp.zeros((1, batch), jnp.int32)
    return export_serving(step, (tok0, hidden0), path, platforms)
