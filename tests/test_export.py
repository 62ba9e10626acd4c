"""StableHLO export of quantized serving programs (the reference's
``--onnx-export``, lstm_models/main.py:196-202 — VERDICT r4 next #5).

Round-trip contract: serialize -> deserialize -> call must reproduce
the direct jitted call on the same platform.  Tolerance is last-ulp
(atol=1e-6 on unit-scale log-probs), not bit-exact: jax.export
AOT-compiles with conservative target features (XLA's cpu_aot_loader
"prefer-no-scatter/gather" path), so CPU codegen may fuse differently
than the in-process jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tq_tpu.utils.export import export_lm_step, export_serving, load_serving


def test_lstm_packed_step_roundtrip(tmp_path):
    """Packed-weight LSTM serving step: export with the u8s planes
    embedded, reload, bit-compare one step."""
    from tq_tpu.models import lstm_lm

    params = lstm_lm.init(jax.random.PRNGKey(0), vocab=64, emsize=16,
                          nhid=16, nlayers=2)
    qp, qcfg, qs = lstm_lm.convert(params, 8, 8, 24, 8, 8)
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    qp = lstm_lm.pack(qp, qcfg, fmt="u8s")

    path = tmp_path / "lstm_step.stablehlo"
    export_lm_step(qp, qcfg, qs, path)
    step = load_serving(path)

    fwd = lstm_lm.make_quantized_apply(qcfg, track=False)
    tok = jnp.asarray([[3]], jnp.int32)
    h0 = lstm_lm.init_hidden(1, nhid=16, nlayers=2)
    logp_d, hid_d, _ = fwd(qp, qs, tok, h0)
    logp_e, hid_e = step(tok, h0)
    np.testing.assert_allclose(np.asarray(logp_e), np.asarray(logp_d),
                               atol=1e-6)
    for a, b in zip(jax.tree.leaves(hid_e), jax.tree.leaves(hid_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gru_step_roundtrip(tmp_path):
    """Cell family travels through qcfg into the artifact."""
    from tq_tpu.models import lstm_lm

    params = lstm_lm.init(jax.random.PRNGKey(1), vocab=32, emsize=8,
                          nhid=8, nlayers=1, cell="GRU")
    qp, qcfg, qs = lstm_lm.convert(params, 8, 8, 24, 8, 8, cell="GRU")
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    step = load_serving(export_lm_step(qp, qcfg, qs))
    fwd = lstm_lm.make_quantized_apply(qcfg, track=False)
    tok = jnp.asarray([[5]], jnp.int32)
    h0 = lstm_lm.init_hidden(1, nhid=8, nlayers=1, cell="GRU")
    logp_e, _ = step(tok, h0)
    logp_d, _, _ = fwd(qp, qs, tok, h0)
    np.testing.assert_allclose(np.asarray(logp_e), np.asarray(logp_d),
                               atol=1e-6)


def test_transformer_decode_step_roundtrip(tmp_path):
    """KV-cache decode step exports with packed linears embedded."""
    from tq_tpu.models import transformer_lm

    V, E, NH, NL, L = 64, 16, 2, 1, 8
    params = transformer_lm.init(jax.random.PRNGKey(2), vocab=V, emsize=E,
                                 nhead=NH, nhid=E, nlayers=NL)
    qp, qcfg, qs = transformer_lm.convert(params, 8, 8, 24, 8, 8)
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    qp = transformer_lm.pack(qp, qcfg, fmt="u8s")

    cache0 = transformer_lm.decode_init_cache(L, 1, E, NH, NL)

    def step(tok, pos, cache):
        return transformer_lm.decode_step(qp, tok, pos, cache, nhead=NH,
                                          qcfg=qcfg, qstate=qs)

    tok = jnp.asarray([[7]], jnp.int32)
    pos = jnp.int32(0)
    data = export_serving(step, (tok, pos, cache0),
                          tmp_path / "tf_step.stablehlo")
    loaded = load_serving(data)
    logp_d, cache_d = jax.jit(step)(tok, pos, cache0)
    logp_e, cache_e = loaded(tok, pos, cache0)
    np.testing.assert_allclose(np.asarray(logp_e), np.asarray(logp_d),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cache_e["k"]),
                               np.asarray(cache_d["k"]), atol=1e-6)


def test_sampler_scan_exports(tmp_path):
    """A whole N-token sampler scan exports as one program."""
    from tq_tpu.models import lstm_lm

    params = lstm_lm.init(jax.random.PRNGKey(3), vocab=32, emsize=8,
                          nhid=8, nlayers=1)
    N = 6

    def sample(tok0):
        h0 = lstm_lm.init_hidden(1, nhid=8, nlayers=1)

        def step(carry, _):
            tok, h = carry
            logp, h = lstm_lm.apply(params, tok, h)
            tok = jnp.argmax(logp[-1]).reshape(1, 1).astype(jnp.int32)
            return (tok, h), tok[0, 0]

        _, toks = jax.lax.scan(step, (tok0, h0), None, length=N)
        return toks

    tok0 = jnp.zeros((1, 1), jnp.int32)
    run = load_serving(export_serving(sample, (tok0,)))
    np.testing.assert_array_equal(np.asarray(run(tok0)),
                                  np.asarray(jax.jit(sample)(tok0)))


def test_export_signature_mismatch_raises(tmp_path):
    """Wrong input shape fails loudly, not silently."""
    f = load_serving(export_serving(lambda x: x * 2,
                                    (jnp.zeros((4,), jnp.float32),)))
    with pytest.raises(Exception):
        f(jnp.zeros((5,), jnp.float32))


def test_generate_cli_export(tmp_path):
    """tq-generate --tr ... --export writes a reloadable artifact."""
    import jax

    from tq_tpu.evals.generate import main
    from tq_tpu.models import lstm_lm
    from tq_tpu.utils.checkpoint import save_params

    params = lstm_lm.init(jax.random.PRNGKey(4), vocab=33278, emsize=16,
                          nhid=16, nlayers=1)
    ck = tmp_path / "lm.npz"
    save_params(ck, params, meta={"model": "LSTM"})
    art = tmp_path / "step.stablehlo"
    main(["--checkpoint", str(ck), "--words", "5",
          "--tr", "8", "8", "24", "8", "8", "--pack", "u8s",
          "--export", str(art), "--outf", str(tmp_path / "out.txt")])
    step = load_serving(art)
    logp, _ = step(jnp.zeros((1, 1), jnp.int32),
                   lstm_lm.init_hidden(1, nhid=16, nlayers=1))
    assert logp.shape == (1, 33278)


def test_generate_cli_export_requires_tr(tmp_path):
    import jax

    from tq_tpu.evals.generate import main
    from tq_tpu.models import lstm_lm
    from tq_tpu.utils.checkpoint import save_params

    ck = tmp_path / "lm.npz"
    save_params(ck, lstm_lm.init(jax.random.PRNGKey(0), vocab=33278,
                                 emsize=8, nhid=8, nlayers=1))
    with pytest.raises(SystemExit, match="requires --tr"):
        main(["--checkpoint", str(ck), "--export", str(tmp_path / "x")])


@pytest.mark.skipif(jax.default_backend() == "tpu",
                    reason="on the TPU backend the quantized apply "
                    "takes the Pallas path, which has no CPU lowering "
                    "— portable artifacts export from a CPU process")
def test_multi_platform_export(tmp_path):
    """One artifact lowered for BOTH cpu and tpu (jax.export
    multi-platform lowering) — portable deployment; executes on the
    current (cpu) backend here."""
    from tq_tpu.models import lstm_lm

    params = lstm_lm.init(jax.random.PRNGKey(5), vocab=32, emsize=8,
                          nhid=8, nlayers=1)
    qp, qcfg, qs = lstm_lm.convert(params, 8, 8, 24, 8, 8)
    qs = {k: {**v, "sf": jnp.float32(0.05)} for k, v in qs.items()}
    qp = lstm_lm.pack(qp, qcfg, fmt="u8s")
    data = export_lm_step(qp, qcfg, qs, platforms=("cpu", "tpu"))
    exp = jax.export.deserialize(data)
    assert set(exp.platforms) == {"cpu", "tpu"}
    logp, _ = exp.call(jnp.zeros((1, 1), jnp.int32),
                       lstm_lm.init_hidden(1, nhid=8, nlayers=1))
    assert logp.shape == (1, 32)
