"""Structural checks on bench.py's suite table and budget math.

The driver-captured record depends on every SUITE row being runnable
and the dynamic caps always fitting the global budget (VERDICT r4 next
#1: a flat per-metric cap let one stuck metric eat half the record and
starve the rest to skips).  These tests pin the invariants without
touching a device."""

import importlib.util
import sys
from pathlib import Path


def _load_bench():
    # bench.py lives at the repo root, outside the package.
    path = Path(__file__).resolve().parents[1] / "bench.py"
    spec = importlib.util.spec_from_file_location("tq_bench", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["tq_bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_suite_rows_well_formed():
    bench = _load_bench()
    names = [n for n, _, _ in bench.SUITE]
    assert len(names) == len(set(names)), "duplicate metric names"
    for name, argv, weight in bench.SUITE:
        assert isinstance(argv, list) and argv, name
        assert weight > 0, name
        # Every subcommand must be dispatchable by main().
        assert argv[0] in ("resnet", "lstm", "generate", "tfgen",
                           "matmul", "quantize"), name
    # The TR-beats-fp32 row leads the record (VERDICT r4 next #3).
    assert names[0] == "resnet18_tr_inference_int8_bf16io"
    # End-to-end rows precede kernel micro-metrics.
    micro = [n for n in names if n.startswith(("term_matmul",
                                               "tr_quantize"))]
    assert names[-len(micro):] == micro


def test_weighted_caps_always_fit_budget():
    """Worst case (every metric runs to its cap) never exceeds the
    budget, and every row still gets >= 45 s of room when the earlier
    rows behave."""
    bench = _load_bench()
    budget = 1200.0
    spent = 0.0
    for i, (name, argv, weight) in enumerate(bench.SUITE):
        remaining = budget - spent
        assert remaining >= 45, \
            f"{name} would be budget-skipped in the worst case"
        weight_left = sum(w for _, _, w in bench.SUITE[i:])
        cap = min(600.0, remaining,
                  max(60.0, remaining * weight / weight_left))
        spent += cap  # worst case: uses the whole cap
    assert spent <= budget + 1e-6
