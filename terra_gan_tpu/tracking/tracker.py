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
semantics), else a zero-dependency local file store that writes the
*MLflow file-store layout* under ./mlruns (meta.yaml + per-run
metrics/params/tags/artifacts) so the reference's offline tooling —
mlflow_metrics_visualizer.py, plot_research_metrics.py — reads this
framework's runs unmodified.
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


def _sanitize_key(name: str) -> str:
    """Make a metric/param/tag name safe as a relative file path.

    MLflow's file store uses the name as the filename; "/" nests
    directories (allowed), but absolute/parent escapes are not.
    """
    name = name.replace("=", "_").replace("\x00", "_")
    parts = [p for p in name.split("/") if p not in ("", ".", "..")]
    return "/".join(parts) or "_"


class FileStoreBackend:
    """MLflow *file-store-layout* local store (no mlflow dependency).

    Emits the exact ``mlruns/`` tree the reference's offline tooling
    reads directly (mlflow_metrics_visualizer.py:31-80 scans
    ``<exp>/<run>/meta.yaml`` + ``tags/`` + ``metrics/<name>`` files of
    ``"timestamp value step"`` lines; reset_mlflow.sh:55-68 shows the
    experiment meta.yaml shape), so those scripts work on this
    framework's runs even when mlflow itself is absent:

        <root>/<experiment>/meta.yaml
        <root>/<experiment>/<run_id>/meta.yaml
        <root>/<experiment>/<run_id>/metrics/<name>
        <root>/<experiment>/<run_id>/params/<name>
        <root>/<experiment>/<run_id>/tags/<name>      (incl. mlflow.runName)
        <root>/<experiment>/<run_id>/artifacts/
    """

    def __init__(self, root: str | Path, experiment_name: str):
        self.experiment_name = experiment_name
        self.exp_dir = Path(root) / experiment_name
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        meta = self.exp_dir / "meta.yaml"
        if not meta.exists():
            now_ms = int(time.time() * 1000)
            meta.write_text(
                f"artifact_location: file:{self.exp_dir.resolve()}\n"
                f"creation_time: {now_ms}\n"
                f"experiment_id: {experiment_name}\n"
                f"last_update_time: {now_ms}\n"
                "lifecycle_stage: active\n"
                f"name: {experiment_name}\n"
            )
        self.run_dir: Optional[Path] = None
        self._metric_files: Dict[str, Any] = {}

    def _write_run_meta(self, run_id: str, run_name: str, status: str,
                        start_ms: int, end_ms: Optional[int]) -> None:
        artifact_uri = (self.run_dir / "artifacts").resolve()
        self._start_ms = start_ms
        (self.run_dir / "meta.yaml").write_text(
            f"artifact_uri: file:{artifact_uri}\n"
            f"end_time: {end_ms if end_ms is not None else 'null'}\n"
            f"experiment_id: {self.experiment_name}\n"
            "lifecycle_stage: active\n"
            f"run_id: {run_id}\n"
            f"run_name: {run_name}\n"
            f"run_uuid: {run_id}\n"
            f"start_time: {start_ms}\n"
            f"status: {status}\n"
            "user_id: terra_gan_tpu\n"
        )

    def start_run(self, run_name: str, tags: Dict[str, str]) -> str:
        # close any handles left from a previous run on this backend:
        # they point into the OLD run's metrics/ dir and would silently
        # receive the new run's appends
        for f in self._metric_files.values():
            f.close()
        self._metric_files = {}
        run_id = uuid.uuid4().hex  # 32-hex, like mlflow run ids
        self.run_dir = self.exp_dir / run_id
        self._run_id, self._run_name = run_id, run_name
        for sub in ("artifacts", "metrics", "params", "tags"):
            (self.run_dir / sub).mkdir(parents=True, exist_ok=True)
        self._write_run_meta(
            run_id, run_name, "RUNNING", int(time.time() * 1000), None
        )
        for key, value in {**tags, "mlflow.runName": run_name}.items():
            self._write_kv("tags", key, value)
        return run_id

    def _write_kv(self, kind: str, key: str, value: Any) -> None:
        path = self.run_dir / kind / _sanitize_key(key)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(str(value))

    def log_params(self, params: Dict[str, Any]) -> None:
        if self.run_dir is None:
            return
        for k, v in params.items():
            self._write_kv("params", k, v)

    def log_metrics(self, metrics: Dict[str, float], step: Optional[int]) -> None:
        if self.run_dir is None:
            return
        ts_ms = int(time.time() * 1000)
        for k, v in metrics.items():
            if not np.isfinite(v):
                continue  # the file store format cannot represent NaN/Inf
            key = _sanitize_key(k)
            f = self._metric_files.get(key)
            if f is None:
                path = self.run_dir / "metrics" / key
                path.parent.mkdir(parents=True, exist_ok=True)
                f = self._metric_files[key] = open(path, "a")
            f.write(f"{ts_ms} {float(v)} {int(step or 0)}\n")
            f.flush()

    def log_artifact(self, local_path: str | Path, name: Optional[str] = None):
        if self.run_dir is None:
            return
        import shutil

        dest = self.run_dir / "artifacts" / (name or Path(local_path).name)
        shutil.copy2(local_path, dest)

    def end_run(self) -> None:
        for f in self._metric_files.values():
            f.close()
        self._metric_files = {}
        if self.run_dir is not None:
            self._write_run_meta(
                self._run_id,
                self._run_name,
                "FINISHED",
                self._start_ms,
                int(time.time() * 1000),
            )
            self.run_dir = None


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
