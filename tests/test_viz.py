"""Figure generation smoke tests (Agg backend, tmp outputs)."""

import json

import jax
import pytest


pytestmark = pytest.mark.slow  # heavyweight tier (make test-fast deselects)

@pytest.fixture
def cnn_results(tmp_path):
    res = {
        "quant": {"accs": [60, 65, 69], "tmacs": [1e10, 2e10, 3e10],
                  "avg_terms": [6, 7, 8], "params": [1e7] * 3},
        "tr-data3": {"accs": [67, 69], "tmacs": [5e9, 8e9],
                     "avg_terms": [1.5, 2.0], "params": [1e7] * 2},
    }
    p = tmp_path / "resnet18-results.json"
    p.write_text(json.dumps(res))
    return p


def test_pareto(cnn_results, tmp_path):
    from tq_tpu.viz import pareto

    out = pareto.plot([cnn_results], tmp_path / "p.pdf")
    assert (tmp_path / "p.pdf").exists()


def test_pareto_pair(tmp_path):
    from tq_tpu.viz import pareto

    q = tmp_path / "q.json"
    t = tmp_path / "t.json"
    q.write_text(json.dumps({"ppls": [90, 87], "tmacs": [3e11, 5e11],
                             "param_bits": [1, 2]}))
    t.write_text(json.dumps({"ppls": [88, 87], "tmacs": [6e10, 1.8e11],
                             "param_bits": [1, 2]}))
    pareto.plot_pair(q, t, tmp_path / "pair.pdf")
    assert (tmp_path / "pair.pdf").exists()


def test_group_size_plot(tmp_path):
    from tq_tpu.viz import group_size

    p = tmp_path / "gs.json"
    p.write_text(json.dumps({
        "1": {"avg_terms": [1, 2, 3], "accs": [62, 69, 69.6], "tmacs": [1, 2, 3]},
        "8": {"avg_terms": [1, 2, 3], "accs": [67, 69.6, 69.6], "tmacs": [1, 2, 3]},
    }))
    group_size.plot(p, tmp_path / "gs.pdf")
    assert (tmp_path / "gs.pdf").exists()


def test_fpga_plot(tmp_path):
    from tq_tpu.viz import fpga

    fpga.plot(tmp_path / "f.pdf")
    assert (tmp_path / "f.pdf").exists()


def test_quant_error_and_term_dist(tmp_path):
    from tq_tpu.viz import quant_error, term_dist

    quant_error.plot("resnet18", out_file=tmp_path / "qe.pdf")
    term_dist.plot("resnet18", out_file=tmp_path / "td.pdf")
    assert (tmp_path / "qe.pdf").exists()
    assert (tmp_path / "td.pdf").exists()


def test_gen_frontier():
    from tq_tpu.viz import gen_frontier

    xs, ys = gen_frontier([3, 1, 2, 4], [5, 1, 6, 4])
    # dominated points dropped; monotone increasing in both
    assert xs == [1, 2] and ys == [1, 6]
