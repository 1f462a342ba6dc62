"""Human-in-the-loop portal layer (SURVEY §2.3 L4a)."""

from .client import PortalClient, experiment_mode
from .helpers import (
    extract_tile_token,
    fetch_annotations_for_grid,
    match_human_and_system_masks,
    validate_dataset,
)
from .pythonanywhere import PythonAnywhereClient
from .upload_results import upload_results

__all__ = [
    "PortalClient",
    "PythonAnywhereClient",
    "experiment_mode",
    "extract_tile_token",
    "fetch_annotations_for_grid",
    "match_human_and_system_masks",
    "upload_results",
    "validate_dataset",
]


def create_server_app(*args, **kwargs):
    """Lazy accessor for the Flask portal app (Flask optional)."""
    from .server import create_app

    return create_app(*args, **kwargs)
