"""Figure generation from results JSONs (reference visualize/).

Five plots (SURVEY.md §2.2 #12), each a module with ``main()`` writing
``figures/*.pdf``:

  pareto      accuracy-vs-tmacs Pareto frontier, UQ vs TR
              (quant_vs_term_reveal.py)
  group_size  g/alpha ablation (group_size.py)
  quant_error per-layer weight quantization error bars (quant_error.py)
  term_dist   per-group term-count distribution (term_group_dist.py)
  fpga        FPGA latency/energy improvement bars (fpga_results.py)

Uses matplotlib's Agg backend (headless); shared rc settings here
mirror visualize/__init__.py.
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

plt.rcParams.update(
    {
        "font.size": 11,
        "axes.grid": True,
        "grid.alpha": 0.3,
        "figure.dpi": 120,
        "savefig.bbox": "tight",
    }
)


def gen_frontier(xs, ys):
    """Pareto frontier: keep points not dominated by a cheaper-and-better
    point (reference quant_vs_term_reveal.py:10-20, lower x better,
    higher y better)."""
    pts = sorted(zip(xs, ys))
    front = []
    best_y = float("-inf")
    for x, y in pts:
        if y > best_y:
            front.append((x, y))
            best_y = y
    return [p[0] for p in front], [p[1] for p in front]
