"""Crash-resume behaviour of the sweep drivers (stubbed evaluation)."""

import json

import numpy as np
import pytest

from tq_tpu.evals import mlp as mlp_eval


def test_mlp_sweep_resumes_from_partial_file(tmp_path, monkeypatch):
    calls = []

    monkeypatch.setattr(mlp_eval, "load_or_train", lambda *a, **k: {})
    import tq_tpu.data as data_pkg

    monkeypatch.setattr(
        data_pkg, "load_mnist",
        lambda d=None: (
            (np.zeros((4, 1, 28, 28), np.float32), np.zeros(4, np.int32)),
            (np.zeros((4, 1, 28, 28), np.float32), np.zeros(4, np.int32)),
            "synthetic",
        ),
    )

    def fake_eval(params, wb, wt, db, dt, gs, x_test, y_test, **kw):
        calls.append((wb, wt))
        return 50.0 + wb, 1000 * wb, 10 * wb

    monkeypatch.setattr(mlp_eval, "evaluate_setting", fake_eval)

    out = tmp_path / "out.json"
    # Partial prior run: 2 of 4 settings done.
    out.write_text(json.dumps(
        {"accs": [52.0, 53.0], "tmacs": [2000.0, 3000.0],
         "param_bits": [20.0, 30.0]}
    ))
    res = mlp_eval.run_sweep(
        [2, 3, 4, 5], [2, 3, 4, 5], [6] * 4, [6] * 4, [1] * 4,
        out_file=str(out), checkpoint="unused", verbose=False,
    )
    # Only the remaining two settings were evaluated.
    assert calls == [(4, 4), (5, 5)]
    assert res["accs"] == [52.0, 53.0, 54.0, 55.0]
    saved = json.loads(out.read_text())
    assert saved["accs"] == res["accs"]


def test_mlp_sweep_fresh_runs_all(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(mlp_eval, "load_or_train", lambda *a, **k: {})
    import tq_tpu.data as data_pkg

    monkeypatch.setattr(
        data_pkg, "load_mnist",
        lambda d=None: (
            (np.zeros((4, 1, 28, 28), np.float32), np.zeros(4, np.int32)),
            (np.zeros((4, 1, 28, 28), np.float32), np.zeros(4, np.int32)),
            "synthetic",
        ),
    )
    monkeypatch.setattr(
        mlp_eval, "evaluate_setting",
        lambda params, wb, wt, db, dt, gs, x_test, y_test, **kw:
        (calls.append(wb) or (1.0, 1, 1)),
    )
    res = mlp_eval.run_sweep(
        [2, 3], [2, 3], [6, 6], [6, 6], [1, 1],
        out_file=str(tmp_path / "o.json"), checkpoint="unused",
        verbose=False,
    )
    assert calls == [2, 3]
