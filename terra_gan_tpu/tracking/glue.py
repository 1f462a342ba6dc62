"""Module-level tracking glue (reference: utils/main_pipeline_mlflow.py,
utils/mlflow_utils.py).

Same API shape around our backend-agnostic ExperimentTracker:
  * setup_mlflow(config)              — singleton tracker init with URI
    normalization (main_pipeline_mlflow.py:24-73)
  * start_run_for_mode(mode, config)  — per-mode run naming
    (main_pipeline_mlflow.py:94-132)
  * log_model_safely(variables, name) — model logging with a local
    fallback when the backend rejects it (main_pipeline_mlflow.py:134-193)
  * initialize_mlflow / cleanup_mlruns / reset helpers
    (mlflow_utils.py:19-188)
  * log_metrics_by_category           — categorized batch logging
    (mlflow_utils.py:206-256)
"""

from __future__ import annotations

import logging
import shutil
import time
from pathlib import Path
from typing import Any, Dict, Optional

from .tracker import ExperimentTracker

logger = logging.getLogger(__name__)

_singleton: Optional[ExperimentTracker] = None


def normalize_tracking_uri(uri: str) -> str:
    if not uri:
        return "file:./mlruns"
    if "://" not in uri and not uri.startswith("file:"):
        return f"file:{uri}"
    return uri


def setup_mlflow(config=None, **kwargs) -> ExperimentTracker:
    """Singleton tracker initialization (reference name kept)."""
    global _singleton
    if _singleton is None:
        _singleton = ExperimentTracker(config, **kwargs)
    return _singleton


def get_tracker() -> Optional[ExperimentTracker]:
    return _singleton


def start_run_for_mode(mode: str, config=None) -> Optional[str]:
    """Start a run named after the pipeline mode (reference naming)."""
    tracker = setup_mlflow(config)
    name = f"{mode}_{time.strftime('%Y%m%d_%H%M%S')}"
    return tracker.start_run(name, params={"mode": mode})


def log_model_safely(
    variables: Any, name: str, tracker: Optional[ExperimentTracker] = None,
    fallback_dir: str | Path = "saved_models",
) -> bool:
    """Model logging that never raises: backend first, local .npz fallback."""
    tracker = tracker or _singleton
    try:
        if tracker is not None:
            tracker.log_model(variables, name)
            return True
    except Exception as e:
        logger.warning("backend model logging failed (%s); local fallback", e)
    try:
        import jax
        import numpy as np

        flat, _ = jax.tree_util.tree_flatten_with_path(variables)
        arrays = {
            "/".join(str(p) for p in path): np.asarray(leaf)
            for path, leaf in flat
        }
        out = Path(fallback_dir)
        out.mkdir(parents=True, exist_ok=True)
        np.savez(out / f"{name}.npz", **arrays)
        return True
    except Exception as e:
        logger.error("local model fallback failed: %s", e)
        return False


def initialize_mlflow(tracking_uri: str = "file:./mlruns") -> str:
    """Ensure the store directory exists; returns the normalized URI."""
    uri = normalize_tracking_uri(tracking_uri)
    Path(uri.replace("file:", "")).mkdir(parents=True, exist_ok=True)
    return uri


def cleanup_mlruns(
    store: str | Path = "./mlruns", backup: bool = True
) -> Optional[Path]:
    """Backup (optional) and recreate the tracking store
    (reset_mlflow.sh / mlflow_utils.py behavior)."""
    store = Path(str(store).replace("file:", ""))
    backup_path = None
    if store.exists():
        if backup:
            backup_path = store.parent / (
                f"{store.name}_backup_{time.strftime('%Y%m%d_%H%M%S')}"
            )
            shutil.move(str(store), backup_path)
        else:
            shutil.rmtree(store)
    store.mkdir(parents=True, exist_ok=True)
    return backup_path


CATEGORY_PREFIXES = ("batch", "epoch", "validation", "training", "system")


def log_metrics_by_category(
    tracker: ExperimentTracker,
    metrics: Dict[str, float],
    category: str,
    step: Optional[int] = None,
) -> None:
    """Prefix-namespaced metric logging (mlflow_utils.py:206-256)."""
    if category not in CATEGORY_PREFIXES:
        logger.warning("unknown metric category %s", category)
    tracker.log_metrics(
        {f"{category}.{k}": v for k, v in metrics.items()}, step=step
    )
