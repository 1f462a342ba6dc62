"""Experiment tracking (SURVEY §2.3): mlflow-or-filestore tracker."""

from .tracker import ExperimentTracker, FileStoreBackend

__all__ = ["ExperimentTracker", "FileStoreBackend"]
