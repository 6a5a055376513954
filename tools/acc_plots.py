#!/usr/bin/env python
"""Accuracy-vs-points / visibility plots from an eval JSON report.

Port of the reference plotting tool (tools/acc_plots_tool.py:11+,
plot_metrics_1d): reads the stratified tables written by tools/test.py /
the eval hook and renders 1-D accuracy curves per stratification mode.

    python tools/acc_plots.py eval_results_full.json --out plots/
"""
from __future__ import annotations

import argparse
import ast
import json
import os


def plot_metrics_1d(table: dict, metric: str, title: str, out_path: str):
    """One curve per stratification mode over bucket index."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for mode in ("at_least_one", "at_least_both"):
        if mode not in table:
            continue
        xs, ys = [], []
        for key, stats in sorted(
                table[mode].items(),
                key=lambda kv: str(kv[0])):
            val = stats.get(metric, -1)
            if val is None or val == -1:
                continue
            try:
                k = ast.literal_eval(key)
                x = k[0] if isinstance(k, tuple) else k
            except (ValueError, SyntaxError):
                x = len(xs)
            xs.append(x)
            ys.append(val)
        if xs:
            order = sorted(range(len(xs)), key=lambda i: xs[i])
            ax.plot([xs[i] for i in order], [ys[i] for i in order],
                    marker="o", label=mode)
    ax.set_xlabel("bucket")
    ax.set_ylabel(metric)
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("report", help="eval_results_full.json from tools/test.py")
    ap.add_argument("--out", default="plots")
    ap.add_argument("--metric", default="accuracy")
    args = ap.parse_args(argv)

    with open(args.report) as f:
        metrics = json.load(f)
    tables = metrics.get("stratified", {})
    os.makedirs(args.out, exist_ok=True)

    written = []
    for name in ("results_per_points", "results_per_visibility",
                 "results_per_distance"):
        if name in tables:
            written.append(plot_metrics_1d(
                tables[name], args.metric, name,
                os.path.join(args.out, f"{name}_{args.metric}.png")))
    for cls, sub in tables.get("per_class", {}).items():
        if "results_per_points" in sub:
            written.append(plot_metrics_1d(
                sub["results_per_points"], args.metric,
                f"{cls}: accuracy vs points",
                os.path.join(args.out, f"points_{cls}_{args.metric}.png")))
    print(json.dumps(dict(plots=written)))


if __name__ == "__main__":
    main()
