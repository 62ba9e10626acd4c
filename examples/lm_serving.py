"""Example: quantized LM generation serving over a device mesh.

The full serving story in one script (the reference's generate.py loop,
re-designed for TPU serving — SURVEY.md §5/§2.4 north star):

1. TR-convert the LSTM LM and pack its weights (9-bit u8s streams).
2. Continuous batching: a ``BatchRunner`` packs incoming prompts into
   fixed-size batches sharded over the mesh's 'data' axis.
3. Each batch generates N tokens as ONE jitted ``lax.scan`` (weights
   VMEM-resident across steps; on-device categorical sampling).

Runs on any device count (virtual CPU mesh: JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os
import time

import jax

# The rig may pre-register a TPU plugin and pin jax_platforms before
# user code runs (sitecustomize), silently overriding JAX_PLATFORMS=cpu;
# honor the env var explicitly (same dance as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tq_tpu.models import lstm_lm
from tq_tpu.parallel.mesh import local_mesh
from tq_tpu.parallel.serving import BatchRunner

VOCAB, EMSIZE, NHID, NLAYERS = 256, 64, 64, 2
WORDS = 16  # tokens generated per request


def main():
    mesh = local_mesh()
    n = mesh.shape["data"]
    batch = max(8, 2 * n)
    print(f"mesh: {dict(mesh.shape)}, serving batch {batch}")

    params = lstm_lm.init(jax.random.PRNGKey(0), vocab=VOCAB,
                          emsize=EMSIZE, nhid=NHID, nlayers=NLAYERS)
    qparams, qcfg, qstate = lstm_lm.convert(params, 8, 8, 24, 8, 8)
    qstate = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qstate.items()}
    qparams = lstm_lm.pack(qparams, qcfg, fmt="u8s")
    fwd = lstm_lm.make_quantized_apply(qcfg, track=False)

    @jax.jit
    def serve_batch(tok0):
        """(B, 1) prompt tokens -> (B, WORDS) generated tokens, one scan."""
        B = tok0.shape[0]
        hidden0 = lstm_lm.init_hidden(B, nhid=NHID, nlayers=NLAYERS)

        def step(carry, key):
            tok, hidden = carry
            logp, hidden, _ = fwd(qparams, qstate, tok, hidden)
            nxt = jax.random.categorical(
                key, logp.reshape(1, B, -1)[-1]
            )[None, :].astype(jnp.int32)
            return (nxt, hidden), nxt[0]

        keys = jax.random.split(jax.random.PRNGKey(0), WORDS)
        _, toks = jax.lax.scan(step, (tok0.T, hidden0), keys)
        return toks.T  # (B, WORDS)

    runner = BatchRunner(serve_batch, mesh, batch_size=batch, pad_value=0)
    rng = np.random.default_rng(0)
    requests = [np.asarray([rng.integers(0, VOCAB)], np.int32)
                for _ in range(3 * batch + 3)]  # ragged: forces a padded tail
    t0 = time.perf_counter()
    results = runner.run_all(requests)
    dt = time.perf_counter() - t0
    assert len(results) == len(requests)
    assert all(r.shape == (WORDS,) for r in results)
    print(f"served {len(results)} generation requests "
          f"({len(results) * WORDS} tokens) in {dt:.2f}s; "
          f"first continuation: {list(map(int, results[0][:8]))}")


if __name__ == "__main__":
    main()
