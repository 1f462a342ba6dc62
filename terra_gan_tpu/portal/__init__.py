"""Human-in-the-loop portal layer (SURVEY §2.3 L4a)."""

from .client import PortalClient, experiment_mode
from .helpers import (
    extract_tile_token,
    fetch_annotations_for_grid,
    match_human_and_system_masks,
    validate_dataset,
)

__all__ = [
    "PortalClient",
    "experiment_mode",
    "extract_tile_token",
    "fetch_annotations_for_grid",
    "match_human_and_system_masks",
    "validate_dataset",
]
