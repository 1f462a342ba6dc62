"""Offline analysis layer (SURVEY §2.3 L4b)."""

from .compare import compare_runs, find_best_run, parameter_impact
from .runs import RunData, load_filestore_runs, load_runs
from .visualize import plot_all_metrics, plot_research_summary

__all__ = [
    "RunData",
    "compare_runs",
    "find_best_run",
    "load_filestore_runs",
    "load_runs",
    "parameter_impact",
    "plot_all_metrics",
    "plot_research_summary",
]
