"""Experiment comparison (reference: utils/expierment_comparison.py).

  * compare_runs: metric table across runs
  * find_best_run: lowest/highest final value of a chosen metric
  * parameter_impact: Pearson correlation between numeric params and a
    target metric across runs (expierment_comparison.py:60-114)

CLI: python -m terra_gan_tpu.analysis.compare --store ./mlruns
        --metric epoch.g_loss [--maximize]
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

import numpy as np

from .runs import RunData, load_runs


def compare_runs(
    runs: List[RunData], metrics: Optional[List[str]] = None
) -> Dict[str, Dict[str, Optional[float]]]:
    metrics = metrics or sorted({m for r in runs for m in r.metrics})
    return {
        run.run_id: {m: run.last(m) for m in metrics if run.last(m) is not None}
        for run in runs
    }


def find_best_run(
    runs: List[RunData], metric: str, maximize: bool = False
) -> Optional[Tuple[RunData, float]]:
    scored = [
        (r, r.last(metric)) for r in runs if r.last(metric) is not None
    ]
    if not scored:
        return None
    return (max if maximize else min)(scored, key=lambda kv: kv[1])


def parameter_impact(
    runs: List[RunData], metric: str
) -> Dict[str, float]:
    """Correlation of each numeric param with the final metric value."""
    rows = []
    for r in runs:
        val = r.last(metric)
        if val is None:
            continue
        numeric = {}
        for k, v in r.params.items():
            try:
                numeric[k] = float(v)
            except (TypeError, ValueError):
                continue
        rows.append((numeric, val))
    if len(rows) < 2:
        return {}
    keys = set.intersection(*(set(n) for n, _ in rows)) if rows else set()
    out = {}
    targets = np.array([v for _, v in rows])
    for k in sorted(keys):
        xs = np.array([n[k] for n, _ in rows])
        if np.std(xs) == 0 or np.std(targets) == 0:
            continue
        out[k] = float(np.corrcoef(xs, targets)[0, 1])
    return out


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Experiment comparison")
    p.add_argument("--store", default="./mlruns")
    p.add_argument("--metric", default="epoch.g_loss")
    p.add_argument("--maximize", action="store_true")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    runs = load_runs(args.store)
    if not runs:
        print("no runs found")
        return 1
    table = compare_runs(runs)
    best = find_best_run(runs, args.metric, args.maximize)
    impact = parameter_impact(runs, args.metric)
    report = {
        "runs": table,
        "best_run": {
            "run_id": best[0].run_id, "value": best[1]
        } if best else None,
        "parameter_impact": impact,
    }
    print(json.dumps(report, indent=2, default=str))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2, default=str)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
