"""Experiment tracking (SURVEY §2.3): mlflow-or-filestore tracker + glue."""

from .glue import (
    cleanup_mlruns,
    initialize_mlflow,
    log_metrics_by_category,
    log_model_safely,
    normalize_tracking_uri,
    setup_mlflow,
    start_run_for_mode,
)
from .tracker import ExperimentTracker, FileStoreBackend

__all__ = [
    "ExperimentTracker",
    "FileStoreBackend",
    "cleanup_mlruns",
    "initialize_mlflow",
    "log_metrics_by_category",
    "log_model_safely",
    "normalize_tracking_uri",
    "setup_mlflow",
    "start_run_for_mode",
]
