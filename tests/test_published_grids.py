"""CI pin: the PUBLISHED_GRIDS presets reproduce every deterministic
column of every published CNN results file, recomputed from spec tables
alone (no model eval — pure arithmetic, so this runs in milliseconds).

This is the test-shaped version of `python -m tq_tpu.evals.compare` for
the grid-dependent columns; the mobilenet TR depthwise offset is the
documented exact correction (PARITY.md).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from tq_tpu.convert import static_conv_layer_settings
from tq_tpu.evals.cnn import PUBLISHED_GRIDS, get_model
from tq_tpu.profilers import cnn_cost

REF = Path("/root/reference/results")

_MOBILENET_DW_MACS = 20_716_416


def _f32(xs):
    return [float(np.float32(v)) for v in xs]


def _assert_close(ours, ref):
    """Equal after f32 cast, allowing the reference's float32 hook-buffer
    accumulation wobble (<1e-6 relative — same rule as the compare CLI)."""
    a, b = np.asarray(_f32(ours)), np.asarray(_f32(ref))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=0)


@pytest.mark.parametrize(
    "arch", ["resnet18", "vgg16_bn", "mobilenet_v2", "efficientnet_b0"]
)
def test_published_grid_reproduces_all_columns(arch):
    ref_path = REF / f"{arch}-results.json"
    if not ref_path.exists():
        pytest.skip("reference results not present")
    ref = json.loads(ref_path.read_text())
    grid = PUBLISHED_GRIDS[arch]
    m = get_model(arch)
    specs = m.conv_specs()

    def cols(wb, gs, wt, db, dt):
        settings = static_conv_layer_settings(specs, wb, gs, wt)
        return cnn_cost(specs, settings, db, dt)

    # quant rows
    got = [cols(wb, 1, wb if grid["uq_wt"] == "wb" else grid["uq_wt"],
                grid["uq_db"], grid["uq_dt"]) for wb in grid["uq_bits"]]
    _assert_close([t for t, _ in got], ref["quant"]["tmacs"])
    _assert_close([a for _, a in got], ref["quant"]["avg_terms"])

    # TR rows (mobilenet's published file billed depthwise convs at the
    # exempt 16 terms — older counter revision; exact documented offset)
    for dt in grid["tr_data_terms"]:
        key = f"tr-data{dt}"
        assert key in ref, key
        got = [cols(9, 8, wt, 9, dt) for wt in grid["tr_weight_terms"]]
        off = dt * 16 * _MOBILENET_DW_MACS if arch == "mobilenet_v2" else 0
        _assert_close([t + off for t, _ in got], ref[key]["tmacs"])
        _assert_close([a for _, a in got], ref[key]["avg_terms"])
    # resnet18/vgg16_bn published files have NO tr-data4 key
    for dt in (2, 3, 4):
        assert (f"tr-data{dt}" in ref) == (dt in grid["tr_data_terms"])


def test_committed_results_match_reference_files():
    """The checked-in results/ files diff clean against the published
    ones (the compare CLI's exit status, in CI)."""
    if not REF.is_dir():
        pytest.skip("reference results not present")
    from tq_tpu.evals.compare import main

    assert main(["results", str(REF)]) == 0
