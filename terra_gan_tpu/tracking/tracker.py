"""Experiment tracking (reference: utils/experiment_tracking.py).

Same public surface as the reference ExperimentTracker —
start_run / log_params / log_metrics / log_training_batch / log_model /
end_run — and the same dotted metric namespace (batch.*, epoch.*,
validation.*, training.*, system.* — SURVEY §5.5), with:

  * a buffered metric queue flushed every `flush_interval` seconds
    (reference buffers 5 s, experiment_tracking.py:59-61,233-309)
  * PSNR/SSIM/L1/L2 computed at log time from pred/target
    (experiment_tracking.py:196-231) — here in one jitted call
  * host + device telemetry under system.* (psutil + jax memory stats
    replacing psutil+CUDA, experiment_tracking.py:449-470)
  * git commit/branch tags when available (experiment_tracking.py:157-173)

Backends: MLflow when importable + enabled (same tracking_uri
semantics), else a local file store writing JSONL under ./mlruns —
one dir per run with metrics.jsonl / params.json / tags.json /
artifacts/ — so zero-dependency environments still record everything.
"""

from __future__ import annotations

import json
import logging
import subprocess
import threading
import time
import uuid
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _git_info() -> Dict[str, str]:
    out = {}
    try:
        for tag, args in (
            ("git_commit", ["rev-parse", "HEAD"]),
            ("git_branch", ["rev-parse", "--abbrev-ref", "HEAD"]),
        ):
            r = subprocess.run(
                ["git"] + args, capture_output=True, text=True, timeout=5
            )
            if r.returncode == 0:
                out[tag] = r.stdout.strip()
    except Exception:
        pass
    return out


class FileStoreBackend:
    """JSONL-per-run local store (no mlflow dependency)."""

    def __init__(self, root: str | Path, experiment_name: str):
        self.exp_dir = Path(root) / experiment_name
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self.run_dir: Optional[Path] = None
        self._metrics_f = None

    def start_run(self, run_name: str, tags: Dict[str, str]) -> str:
        run_id = f"{time.strftime('%Y%m%d_%H%M%S')}_{uuid.uuid4().hex[:8]}"
        self.run_dir = self.exp_dir / run_id
        (self.run_dir / "artifacts").mkdir(parents=True, exist_ok=True)
        with open(self.run_dir / "tags.json", "w") as f:
            json.dump({**tags, "run_name": run_name}, f, indent=2)
        self._metrics_f = open(self.run_dir / "metrics.jsonl", "a")
        return run_id

    def log_params(self, params: Dict[str, Any]) -> None:
        if self.run_dir is None:
            return
        path = self.run_dir / "params.json"
        existing = {}
        if path.exists():
            existing = json.loads(path.read_text())
        existing.update({k: str(v) for k, v in params.items()})
        path.write_text(json.dumps(existing, indent=2))

    def log_metrics(self, metrics: Dict[str, float], step: Optional[int]) -> None:
        if self._metrics_f is None:
            return
        rec = {"ts": time.time(), "step": step, **metrics}
        self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()

    def log_artifact(self, local_path: str | Path, name: Optional[str] = None):
        if self.run_dir is None:
            return
        import shutil

        dest = self.run_dir / "artifacts" / (name or Path(local_path).name)
        shutil.copy2(local_path, dest)

    def end_run(self) -> None:
        if self._metrics_f is not None:
            self._metrics_f.close()
            self._metrics_f = None


class MlflowBackend:
    def __init__(self, tracking_uri: str, experiment_name: str):
        import mlflow

        self.mlflow = mlflow
        mlflow.set_tracking_uri(tracking_uri)
        mlflow.set_experiment(experiment_name)
        self._run = None

    def start_run(self, run_name: str, tags: Dict[str, str]) -> str:
        self._run = self.mlflow.start_run(run_name=run_name, tags=tags)
        return self._run.info.run_id

    def log_params(self, params: Dict[str, Any]) -> None:
        self.mlflow.log_params({k: str(v)[:250] for k, v in params.items()})

    def log_metrics(self, metrics: Dict[str, float], step: Optional[int]) -> None:
        clean = {
            k.replace("=", "_"): float(v)
            for k, v in metrics.items()
            if np.isfinite(v)
        }
        self.mlflow.log_metrics(clean, step=step or 0)

    def log_artifact(self, local_path, name=None):
        self.mlflow.log_artifact(str(local_path))

    def end_run(self) -> None:
        if self._run is not None:
            self.mlflow.end_run()
            self._run = None


class ExperimentTracker:
    """Drop-in equivalent of the reference tracker over either backend."""

    def __init__(
        self,
        config: Optional[Any] = None,
        experiment_name: Optional[str] = None,
        tracking_uri: Optional[str] = None,
        flush_interval: float = 5.0,
        force_file_store: bool = False,
    ):
        # accept either our Config or a raw dict (reference passes dicts)
        tags: Dict[str, str] = {}
        enabled = True
        if config is not None:
            track = getattr(config, "experiment_tracking", None)
            if track is not None:
                enabled = track.enabled
                experiment_name = experiment_name or track.experiment_name
                tracking_uri = tracking_uri or track.tracking_uri
                tags.update(track.tags)
            elif isinstance(config, dict):
                et = config.get("experiment_tracking", {})
                enabled = et.get("enabled", True)
                experiment_name = experiment_name or et.get(
                    "experiment_name", "dsm_inpainting"
                )
                tracking_uri = tracking_uri or et.get(
                    "tracking_uri", "file:./mlruns"
                )
                tags.update(et.get("tags", {}) or {})
        experiment_name = experiment_name or "dsm_inpainting"
        tracking_uri = tracking_uri or "file:./mlruns"
        self.enabled = enabled
        self.base_tags = {**tags, **_git_info()}
        self.run_id: Optional[str] = None

        self.backend: Optional[Any] = None
        if not enabled:
            return
        if not force_file_store:
            try:
                self.backend = MlflowBackend(tracking_uri, experiment_name)
            except Exception as e:
                logger.info("mlflow unavailable (%s); using file store", e)
        if self.backend is None:
            root = tracking_uri.replace("file:", "") or "./mlruns"
            self.backend = FileStoreBackend(root, experiment_name)

        self._buffer: List = []
        self._lock = threading.Lock()
        self._flush_interval = flush_interval
        self._last_flush = time.time()
        self._quality_fn = None

    # -- lifecycle ---------------------------------------------------------
    def start_run(self, run_name: str, params: Optional[Dict] = None) -> Optional[str]:
        if self.backend is None:
            return None
        self.run_id = self.backend.start_run(run_name, self.base_tags)
        if params:
            self.log_params(params)
        return self.run_id

    def end_run(self) -> None:
        if self.backend is None:
            return
        self._flush(force=True)
        self.backend.end_run()
        self.run_id = None

    # -- logging -----------------------------------------------------------
    def log_params(self, params: Dict[str, Any], prefix: str = "") -> None:
        if self.backend is None:
            return
        flat: Dict[str, Any] = {}

        def rec(d, pfx):
            for k, v in d.items():
                key = f"{pfx}{k}"
                if isinstance(v, dict):
                    rec(v, key + ".")
                else:
                    flat[key] = v

        rec(params, prefix)
        self.backend.log_params(flat)

    def log_metrics(
        self, metrics: Dict[str, float], step: Optional[int] = None
    ) -> None:
        if self.backend is None:
            return
        clean = {}
        for k, v in metrics.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                continue
        with self._lock:
            self._buffer.append((clean, step))
        self._flush()

    def _flush(self, force: bool = False) -> None:
        now = time.time()
        if not force and now - self._last_flush < self._flush_interval:
            return
        with self._lock:
            buffered, self._buffer = self._buffer, []
            self._last_flush = now
        for metrics, step in buffered:
            try:
                self.backend.log_metrics(metrics, step)
            except Exception as e:
                logger.warning("metric flush failed: %s", e)

    def _quality(self, pred, target) -> Dict[str, float]:
        import jax

        from ..evaluation.metrics import image_quality_metrics

        if self._quality_fn is None:
            self._quality_fn = jax.jit(image_quality_metrics)
        vals = self._quality_fn(pred, target)
        return {k: float(v) for k, v in vals.items()}

    def log_training_batch(
        self,
        pred=None,
        target=None,
        batch_metrics: Optional[Dict[str, float]] = None,
        step: Optional[int] = None,
        **_ignored,
    ) -> None:
        """Batch-level logging: losses + image quality + system telemetry."""
        if self.backend is None:
            return
        out: Dict[str, float] = {}
        if batch_metrics:
            out.update({f"batch.{k}": float(v) for k, v in batch_metrics.items()})
        if pred is not None and target is not None:
            try:
                out.update(
                    {f"batch.{k}": v for k, v in self._quality(pred, target).items()}
                )
            except Exception as e:
                logger.warning("quality metrics failed: %s", e)
        out.update(self._system_metrics())
        self.log_metrics(out, step=step)

    def _system_metrics(self) -> Dict[str, float]:
        from ..evaluation.metrics import resource_metrics

        return {f"system.{k}": v for k, v in resource_metrics().items()}

    def log_model(
        self,
        variables: Any,
        name: str,
        metrics: Optional[Dict[str, float]] = None,
        **_ignored,
    ) -> None:
        """Persist a model pytree as an artifact (.npz of flat arrays)."""
        if self.backend is None:
            return
        import tempfile

        import jax

        flat, _ = jax.tree_util.tree_flatten_with_path(variables)
        arrays = {
            "/".join(str(p) for p in path): np.asarray(leaf)
            for path, leaf in flat
        }
        with tempfile.TemporaryDirectory() as td:
            path = Path(td) / f"{name}.npz"
            np.savez(path, **arrays)
            self.backend.log_artifact(path, f"{name}.npz")
        if metrics:
            self.log_metrics({f"model.{name}.{k}": v for k, v in metrics.items()})

    def log_artifact(self, local_path, name=None) -> None:
        if self.backend is not None:
            self.backend.log_artifact(local_path, name)
