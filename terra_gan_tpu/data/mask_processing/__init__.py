"""Mask generation subsystem (SURVEY §2.2 mask processing)."""

from .detectors import (
    BuildingDetector,
    FieldDetector,
    RoadDetector,
    VegetationDetector,
)
from .pipeline import (
    MaskPipeline,
    MaskType,
    combine_masks,
    resize_mask_to_dem,
)

__all__ = [
    "BuildingDetector",
    "FieldDetector",
    "MaskPipeline",
    "MaskType",
    "RoadDetector",
    "VegetationDetector",
    "combine_masks",
    "resize_mask_to_dem",
]
