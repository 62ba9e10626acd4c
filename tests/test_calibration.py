"""Calibration fidelity tests: histogram semantics + MSE scale search."""

import numpy as np
import pytest

from tq_tpu.layers.quantize import (
    CalibConfig,
    act_quantize,
    histogram_update,
    init_histogram,
    mse_search_scale,
)
from tq_tpu.ops.term_reveal import term_reveal


def test_histogram_matches_torch_histc(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(0, 5, size=(10000,)).astype(np.float32)
    x[:10] = 60.0  # out of range high
    x[10:20] = -60.0  # out of range low
    cfg = CalibConfig()
    got = np.asarray(histogram_update(init_histogram(cfg), x, cfg))
    want = torch.histc(torch.from_numpy(x), cfg.num_bins, cfg.minv, cfg.maxv).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_mse_search_small_grid_matches_direct_loop(rng):
    """Chunked/vmapped search == the reference's per-candidate loop."""
    cfg = CalibConfig(num_bins=256, num_candidates=128, minv=-10.0, maxv=10.0)
    hist = np.zeros(256, np.float32)
    samples = rng.normal(0, 2.0, size=5000).astype(np.float32)
    hist_j = histogram_update(init_histogram(cfg), samples, cfg)
    sf = float(mse_search_scale(hist_j, bits=6, terms=6, cfg=cfg))

    # direct loop (mirrors tr_layer.py:43-54)
    x_grid = np.linspace(cfg.minv, cfg.maxv, cfg.num_bins).astype(np.float32)
    hist_np = np.asarray(hist_j)
    best, best_err = None, np.inf
    for cand in np.linspace(cfg.sf_min, cfg.maxv, cfg.num_candidates):
        xh = np.asarray(term_reveal(x_grid, float(cand), 6, 1, 6, axis=-1))
        err = float((hist_np * (x_grid - xh) ** 2).sum())
        if err < best_err:
            best, best_err = float(cand), err
    assert sf == pytest.approx(best, rel=1e-6)


def test_mse_search_sane_scale(rng):
    """Search finds a scale that covers the distribution's range."""
    cfg = CalibConfig(num_candidates=512)
    samples = rng.normal(0, 1.0, size=20000).astype(np.float32)
    hist = histogram_update(init_histogram(cfg), samples, cfg)
    sf = float(mse_search_scale(hist, bits=8, terms=8, cfg=cfg))
    # 8-bit range: sf * 255 should comfortably cover ~4 sigma, and sf
    # should not be wildly larger than needed.
    assert 4.0 / 255 < sf < 0.2


def test_act_quantize_roundtrip(rng):
    x = rng.normal(0, 1, size=(4, 64)).astype(np.float32)
    y = np.asarray(act_quantize(x, 0.05, 8, 3, use_pallas=False))
    want = np.asarray(term_reveal(x, 0.05, 8, 1, 3, axis=-1))
    np.testing.assert_array_equal(y, want)
