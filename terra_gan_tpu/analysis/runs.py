"""Run loading for the analysis layer.

The reference's visualizers scan the MLflow file store directly
(mlflow_metrics_visualizer.py:31-80) or via the client API
(plot_research_metrics.py:53-68). This module loads runs from either
backend our tracker writes: the zero-dep JSONL file store
(<root>/<experiment>/<run_id>/{metrics.jsonl,params.json,tags.json})
or a real mlruns directory when mlflow is importable.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


@dataclass
class RunData:
    run_id: str
    experiment: str
    name: str = ""
    params: Dict[str, str] = field(default_factory=dict)
    tags: Dict[str, str] = field(default_factory=dict)
    # metric name -> (steps, values) arrays
    metrics: Dict[str, tuple] = field(default_factory=dict)

    @property
    def run_type(self) -> str:
        """train / evaluate / human_guided, derived from the run name."""
        for t in ("human_guided", "evaluate", "train"):
            if t in self.name or t in self.run_id:
                return t
        return "other"

    def last(self, metric: str) -> Optional[float]:
        if metric not in self.metrics:
            return None
        return float(self.metrics[metric][1][-1])


def load_filestore_runs(root: str | Path) -> List[RunData]:
    """Load every run from the tracker's JSONL file store."""
    root = Path(root)
    runs: List[RunData] = []
    if not root.exists():
        return runs
    for exp_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        for run_dir in sorted(p for p in exp_dir.iterdir() if p.is_dir()):
            metrics_file = run_dir / "metrics.jsonl"
            if not metrics_file.exists():
                continue
            run = RunData(run_id=run_dir.name, experiment=exp_dir.name)
            tags_file = run_dir / "tags.json"
            if tags_file.exists():
                run.tags = json.loads(tags_file.read_text())
                run.name = run.tags.get("run_name", "")
            params_file = run_dir / "params.json"
            if params_file.exists():
                run.params = json.loads(params_file.read_text())
            series: Dict[str, List] = {}
            for line in metrics_file.read_text().splitlines():
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                step = rec.get("step") or 0
                for k, v in rec.items():
                    if k in ("ts", "step"):
                        continue
                    series.setdefault(k, []).append((step, v))
            for k, pts in series.items():
                pts.sort(key=lambda p: p[0])
                steps = np.array([p[0] for p in pts])
                vals = np.array([p[1] for p in pts], dtype=np.float64)
                run.metrics[k] = (steps, vals)
            runs.append(run)
    return runs


def load_mlflow_runs(tracking_uri: str) -> List[RunData]:  # pragma: no cover
    import mlflow

    client = mlflow.tracking.MlflowClient(tracking_uri)
    runs: List[RunData] = []
    for exp in client.search_experiments():
        for info in client.search_runs([exp.experiment_id]):
            run = RunData(
                run_id=info.info.run_id,
                experiment=exp.name,
                name=info.data.tags.get("mlflow.runName", ""),
                params=dict(info.data.params),
                tags=dict(info.data.tags),
            )
            for key in info.data.metrics:
                hist = client.get_metric_history(info.info.run_id, key)
                steps = np.array([h.step for h in hist])
                vals = np.array([h.value for h in hist])
                run.metrics[key] = (steps, vals)
            runs.append(run)
    return runs


def load_runs(root_or_uri: str | Path = "./mlruns") -> List[RunData]:
    uri = str(root_or_uri)
    path = Path(uri.replace("file:", ""))
    runs = load_filestore_runs(path)
    if runs:
        return runs
    try:
        return load_mlflow_runs(uri)
    except Exception:
        return []
