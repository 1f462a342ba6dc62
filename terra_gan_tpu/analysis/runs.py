"""Run loading for the analysis layer.

The reference's visualizers scan the MLflow file store directly
(mlflow_metrics_visualizer.py:31-80) or via the client API
(plot_research_metrics.py:53-68). This module loads runs from any
layout our tracker has ever written: the MLflow file-store layout
(<root>/<experiment>/<run_id>/{meta.yaml,metrics/<name>,params/,tags/})
that the zero-dep backend now emits, the legacy round-1 JSONL layout
(metrics.jsonl/params.json/tags.json), or a real mlflow server via the
client API.
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


def _load_legacy_jsonl_run(run_dir: Path, experiment: str) -> RunData:
    """Round-1 layout: metrics.jsonl / params.json / tags.json."""
    run = RunData(run_id=run_dir.name, experiment=experiment)
    tags_file = run_dir / "tags.json"
    if tags_file.exists():
        run.tags = json.loads(tags_file.read_text())
        run.name = run.tags.get("run_name", "")
    params_file = run_dir / "params.json"
    if params_file.exists():
        run.params = json.loads(params_file.read_text())
    series: Dict[str, List] = {}
    for line in (run_dir / "metrics.jsonl").read_text().splitlines():
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
        run.metrics[k] = (
            np.array([p[0] for p in pts]),
            np.array([p[1] for p in pts], dtype=np.float64),
        )
    return run


def _read_kv_dir(d: Path) -> Dict[str, str]:
    out: Dict[str, str] = {}
    if not d.is_dir():
        return out
    for f in sorted(d.rglob("*")):
        if f.is_file():
            out[str(f.relative_to(d))] = f.read_text().strip()
    return out


def _load_mlruns_layout_run(run_dir: Path, experiment: str) -> RunData:
    """MLflow file-store layout: meta.yaml + metrics/<name> files of
    "timestamp value step" lines (what mlflow_metrics_visualizer.py:220-240
    parses)."""
    run = RunData(run_id=run_dir.name, experiment=experiment)
    run.tags = _read_kv_dir(run_dir / "tags")
    run.name = run.tags.get("mlflow.runName", run.tags.get("run_name", ""))
    run.params = _read_kv_dir(run_dir / "params")
    metrics_dir = run_dir / "metrics"
    for f in sorted(metrics_dir.rglob("*")):
        if not f.is_file():
            continue
        pts = []
        for line in f.read_text().splitlines():
            parts = line.split()
            if len(parts) >= 3:
                try:
                    pts.append((int(parts[2]), float(parts[1])))
                except ValueError:
                    continue
        if pts:
            pts.sort(key=lambda p: p[0])
            run.metrics[str(f.relative_to(metrics_dir))] = (
                np.array([p[0] for p in pts]),
                np.array([p[1] for p in pts], dtype=np.float64),
            )
    return run


def load_filestore_runs(root: str | Path) -> List[RunData]:
    """Load every run from the tracker's local file store (either layout)."""
    root = Path(root)
    runs: List[RunData] = []
    if not root.exists():
        return runs
    for exp_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        if exp_dir.name.startswith("."):
            continue
        for run_dir in sorted(p for p in exp_dir.iterdir() if p.is_dir()):
            if (run_dir / "metrics.jsonl").exists():
                runs.append(_load_legacy_jsonl_run(run_dir, exp_dir.name))
            elif (run_dir / "metrics").is_dir():
                runs.append(_load_mlruns_layout_run(run_dir, exp_dir.name))
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
