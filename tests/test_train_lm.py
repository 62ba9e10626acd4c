"""Training-driver tests for the five reference model families
(lstm_models/main.py:13-17, 99-107): LSTM / GRU / RNN_TANH / RNN_RELU /
Transformer through one annealed-SGD loop, best-val checkpointing, and
checkpoint round-trip into the eval sweep (VERDICT r3 next #4, #7)."""

import json
import math

import numpy as np
import pytest

from tq_tpu.evals.train_lstm import MODELS, evaluate, train


def _tiny_corpus(tmp_path):
    """A real on-disk corpus (exercises the Corpus tokenizer, not the
    synthetic fallback) with a small vocabulary."""
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(30)]
    # Zipf-skewed unigram distribution: learnable structure (uniform
    # text would pin the optimal loss at log(vocab) and the training
    # assertion below would be vacuous).
    p = 1.0 / np.arange(1, 31)
    p /= p.sum()
    root = tmp_path / "corpus"
    root.mkdir()
    for split, lines in [("train", 120), ("valid", 30), ("test", 30)]:
        text = "\n".join(
            " ".join(rng.choice(words, size=8, p=p)) for _ in range(lines)
        )
        (root / f"{split}.txt").write_text(text)
    return root


@pytest.mark.parametrize("model", ["LSTM", "GRU", "RNN_TANH", "Transformer"])
def test_train_reduces_val_loss(tmp_path, model):
    """Two epochs on a tiny corpus beat the uniform-random baseline and
    the best-val checkpoint is written."""
    root = _tiny_corpus(tmp_path)
    save = tmp_path / "lm.npz"
    params, best_val = train(
        epochs=2, batch_size=4, bptt=8, lr=5.0, dropout=0.0,
        data_dir=root, save_path=save, emsize=16, nhid=16, nlayers=2,
        verbose=False, model=model,
    )
    # vocab = 30 words + <eos>; untrained loss ~= log(31).
    assert best_val < math.log(31) - 0.05
    assert save.exists()


def test_train_rejects_unknown_model(tmp_path):
    with pytest.raises(ValueError, match="model must be one of"):
        train(epochs=1, data_dir=_tiny_corpus(tmp_path), verbose=False,
              model="MAMBA")


def test_transformer_checkpoint_roundtrips_into_sweep(tmp_path):
    """train --model Transformer -> npz -> evals.lstm --model Transformer
    (the reference's evaluate_lstm.py protocol on the trained params)."""
    from tq_tpu.evals.lstm import run_sweep

    root = _tiny_corpus(tmp_path)
    save = tmp_path / "transformer.npz"
    train(epochs=1, batch_size=4, bptt=8, lr=5.0, dropout=0.0,
          data_dir=root, save_path=save, emsize=16, nhid=16, nlayers=1,
          verbose=False, model="Transformer")
    out = tmp_path / "sweep.json"
    res = run_sweep([8], [24], [8], [8], [8], out_file=out,
                    checkpoint=save, data_dir=root, verbose=False,
                    model="Transformer")
    assert len(res["ppls"]) == 1 and res["ppls"][0] > 0
    assert json.loads(out.read_text())["tmacs"][0] > 0


def test_gru_checkpoint_roundtrips_into_sweep(tmp_path):
    """--model GRU trains AND evals (VERDICT r3 next #7 'done' bar)."""
    from tq_tpu.evals.lstm import run_sweep

    root = _tiny_corpus(tmp_path)
    save = tmp_path / "gru.npz"
    train(epochs=1, batch_size=4, bptt=8, lr=5.0, dropout=0.0,
          data_dir=root, save_path=save, emsize=16, nhid=16, nlayers=2,
          verbose=False, model="GRU")
    out = tmp_path / "sweep.json"
    res = run_sweep([8], [24], [8], [8], [8], out_file=out,
                    checkpoint=save, data_dir=root, verbose=False,
                    model="GRU")
    assert len(res["ppls"]) == 1 and math.isfinite(res["ppls"][0])


def test_evaluate_matches_models():
    """evaluate() runs for every family on the synthetic-free path."""
    import jax

    from tq_tpu.models import lstm_lm, transformer_lm

    stream = np.random.default_rng(1).integers(0, 20, (33, 2)).astype(np.int32)
    p = lstm_lm.init(jax.random.PRNGKey(0), vocab=20, emsize=8, nhid=8,
                     nlayers=1, cell="GRU")
    loss = evaluate(p, stream, bptt=8, model="GRU")
    assert math.isfinite(loss)
    pt = transformer_lm.init(jax.random.PRNGKey(0), vocab=20, emsize=8,
                             nhead=2, nhid=8, nlayers=1)
    loss_t = evaluate(pt, stream, bptt=8, model="Transformer")
    assert math.isfinite(loss_t)


def test_models_list_matches_reference():
    assert set(MODELS) == {"LSTM", "GRU", "RNN_TANH", "RNN_RELU",
                           "Transformer"}


def test_untied_training_and_fidelity_flags(tmp_path, capsys):
    """Reference-default UNTIED training (main.py:36-37) with the
    fidelity knobs --clip/--seed/--log-interval threaded through
    (VERDICT r4 next #6): the decoder materializes its own weight,
    training improves it, and the checkpoint records the family."""
    from tq_tpu.utils.checkpoint import load_params

    root = _tiny_corpus(tmp_path)
    save = tmp_path / "untied.npz"
    params, best_val = train(
        epochs=2, batch_size=4, bptt=8, lr=5.0, dropout=0.0, seed=7,
        data_dir=root, save_path=save, emsize=16, nhid=16, nlayers=1,
        verbose=False, model="LSTM", tied=False, clip=0.5, log_interval=5,
    )
    assert "w" in params["decoder"]  # untied: own decoder weight
    assert params["decoder"]["w"].shape == (16, 31)
    assert best_val < math.log(31) - 0.05
    back, meta = load_params(save, with_meta=True)
    assert "w" in back["decoder"] and meta["model"] == "LSTM"
    assert "| ppl " in capsys.readouterr().out  # log-interval lines


def test_generate_tr_threads_cell(tmp_path):
    """generate_tr on a GRU checkpoint (ADVICE r4 #2: used to
    hard-code LSTM and crash on gate-shape broadcast)."""
    import jax

    from tq_tpu.evals.generate import generate_tr
    from tq_tpu.models import lstm_lm

    params = lstm_lm.init(jax.random.PRNGKey(0), vocab=31, emsize=16,
                          nhid=16, nlayers=2, cell="GRU")
    toks = generate_tr(params, 31, words=12, tr=(8, 8, 24, 8, 8))
    assert len(toks) == 12 and all(0 <= t < 31 for t in toks)


def test_train_cli_export(tmp_path):
    """train --export writes the reference main.py:196-202 deployable
    (fp32 serving step of the best model) as StableHLO."""
    import jax.numpy as jnp

    from tq_tpu.evals.train_lstm import main
    from tq_tpu.models import lstm_lm
    from tq_tpu.utils.export import load_serving

    root = _tiny_corpus(tmp_path)
    art = tmp_path / "step.stablehlo"
    main(["--model", "GRU", "--epochs", "1", "--batch-size", "4",
          "--bptt", "8", "--lr", "5", "--dropout", "0",
          "--log-interval", "0", "--emsize", "8", "--nhid", "8",
          "--nlayers", "1", "--data", str(root),
          "--save", str(tmp_path / "m.npz"), "--export", str(art)])
    step = load_serving(art)
    logp, _ = step(jnp.zeros((1, 1), jnp.int32),
                   lstm_lm.init_hidden(1, nhid=8, nlayers=1, cell="GRU"))
    assert logp.shape == (1, 31)
