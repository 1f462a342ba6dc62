"""Metric visualizers (reference: mlflow_metrics_visualizer.py,
plot_research_metrics.py).

  * plot_all_metrics: one PNG per metric per run group with a linear
    trendline (mlflow_metrics_visualizer.py:31-80 behavior)
  * plot_research_summary: publication-style multi-panel figure —
    loss curves per phase (train/validation/human-guided) on a
    normalized timeline (plot_research_metrics.py:31-80)

CLI: python -m terra_gan_tpu.analysis.visualize --store ./mlruns
        [--output-dir metric_plots] [--summary]
"""

from __future__ import annotations

import logging
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .runs import RunData, load_runs

logger = logging.getLogger(__name__)


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_all_metrics(
    runs: List[RunData],
    output_dir: str | Path = "metric_plots",
    with_trendline: bool = True,
) -> List[Path]:
    """Every metric of every run grouped by run type, with trendlines."""
    plt = _plt()
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    written: List[Path] = []

    groups: Dict[str, List[RunData]] = defaultdict(list)
    for run in runs:
        groups[run.run_type].append(run)

    for rtype, group in groups.items():
        metric_names = sorted({m for r in group for m in r.metrics})
        for metric in metric_names:
            fig, ax = plt.subplots(figsize=(8, 5))
            plotted = False
            for run in group:
                if metric not in run.metrics:
                    continue
                steps, vals = run.metrics[metric]
                ok = np.isfinite(vals)
                if ok.sum() == 0:
                    continue
                ax.plot(
                    steps[ok], vals[ok], marker="o", markersize=3,
                    alpha=0.8, label=run.run_id[:18],
                )
                if with_trendline and ok.sum() >= 2:
                    coef = np.polyfit(steps[ok], vals[ok], 1)
                    ax.plot(
                        steps[ok], np.polyval(coef, steps[ok]),
                        "--", alpha=0.5,
                    )
                plotted = True
            if not plotted:
                plt.close(fig)
                continue
            ax.set_title(f"{rtype}: {metric}")
            ax.set_xlabel("step")
            ax.set_ylabel(metric)
            ax.legend(fontsize=7)
            safe = metric.replace(".", "_").replace("/", "_")
            path = output_dir / f"{rtype}_{safe}.png"
            fig.savefig(path, bbox_inches="tight", dpi=100)
            plt.close(fig)
            written.append(path)
    logger.info("wrote %d metric plots to %s", len(written), output_dir)
    return written


def plot_research_summary(
    runs: List[RunData],
    output_path: str | Path = "research_metrics.png",
    key_metrics: Optional[List[str]] = None,
) -> Optional[Path]:
    """Multi-panel phase summary on a normalized [0,1] timeline."""
    plt = _plt()
    key_metrics = key_metrics or [
        "epoch.g_loss", "epoch.d_loss", "validation.g_loss", "epoch.loss",
    ]
    panels = []
    for metric in key_metrics:
        series = [
            (r, r.metrics[metric]) for r in runs if metric in r.metrics
        ]
        if series:
            panels.append((metric, series))
    if not panels:
        logger.warning("no key metrics found across %d runs", len(runs))
        return None

    fig, axes = plt.subplots(
        1, len(panels), figsize=(5 * len(panels), 4), squeeze=False
    )
    for ax, (metric, series) in zip(axes[0], panels):
        for run, (steps, vals) in series:
            t = (
                (steps - steps.min()) / max(1, steps.max() - steps.min())
                if len(steps) > 1
                else np.zeros_like(steps)
            )
            ax.plot(t, vals, alpha=0.8, label=run.run_type)
        ax.set_title(metric)
        ax.set_xlabel("normalized progress")
        ax.legend(fontsize=7)
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return output_path


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Metric visualization")
    p.add_argument("--store", default="./mlruns")
    p.add_argument("--output-dir", default="metric_plots")
    p.add_argument("--summary", action="store_true")
    args = p.parse_args(argv)
    runs = load_runs(args.store)
    if not runs:
        print("no runs found")
        return 1
    plot_all_metrics(runs, args.output_dir)
    if args.summary:
        plot_research_summary(
            runs, Path(args.output_dir) / "research_summary.png"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
