"""Mask generation pipeline: detectors -> combined inpainting mask.

Combination contract (reference: utils/mask_processing/core.py:77-171):
  * run all four detectors, binarize each at >127, bitwise-OR in
    priority order buildings > roads > vegetation > fields
  * INVERT the result: after inversion 0 = detected feature (hole to
    inpaint), 255 = preserved background. (The reference docstring at
    core.py:82-85 states the opposite of what downstream consumes;
    the ground truth is dataset.py:37 / evaluate_terrain.py:10-12 —
    WHITE = preserved. We implement the actual behavior.)
  * masks are nearest-resized to the reference mask's dims if needed.

resize_mask_to_dem (core.py:191-226): nearest-resize the combined mask
to the DEM PNG's dimensions, binarize at >127 AFTER resizing, save as
<dem_stem>_mask_resized.png.

TPU-first delta: the reference runs detectors sequentially per tile
inside the zip loop (zip_handler.py:69, SURVEY §3.1 hot loop #1); here
`MaskPipeline.process_batch` fans tiles out over a thread pool (cv2
releases the GIL), overlapping with device compute.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from enum import Enum
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .detectors import (
    BuildingDetector,
    FieldDetector,
    RoadDetector,
    VegetationDetector,
)

logger = logging.getLogger(__name__)


class MaskType(Enum):
    ROADS = "roads"
    BUILDINGS = "buildings"
    VEGETATION = "vegetation"
    FIELDS = "fields"
    COMBINED = "combined"


# priority order for the bitwise-OR combination (core.py:108-113)
PRIORITY = (
    MaskType.BUILDINGS,
    MaskType.ROADS,
    MaskType.VEGETATION,
    MaskType.FIELDS,
)


def combine_masks(
    masks: Dict[MaskType, np.ndarray], invert_output: bool = True
) -> np.ndarray:
    """OR-combine binarized detector masks; invert so 255 = preserved."""
    ref = next(iter(masks.values()))
    h, w = ref.shape[:2]
    combined = np.zeros((h, w), np.uint8)
    for mask_type in PRIORITY:
        mask = masks.get(mask_type)
        if mask is None:
            continue
        if mask.shape[:2] != (h, w):
            mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
        combined |= np.where(mask > 127, np.uint8(255), np.uint8(0))
    return (255 - combined) if invert_output else combined


def resize_mask_to_dem(
    mask: np.ndarray | str | Path,
    dem_png_path: str | Path,
    output_path: Optional[str | Path] = None,
) -> Path:
    """Nearest-resize mask to DEM dims, binarize >127, save *_mask_resized.png."""
    if isinstance(mask, (str, Path)):
        arr = cv2.imread(str(mask), cv2.IMREAD_GRAYSCALE)
        if arr is None:
            raise ValueError(f"cannot read mask: {mask}")
    else:
        arr = mask
    dem = cv2.imread(str(dem_png_path), cv2.IMREAD_GRAYSCALE)
    if dem is None:
        raise ValueError(f"cannot read DEM: {dem_png_path}")
    h, w = dem.shape[:2]
    resized = cv2.resize(arr, (w, h), interpolation=cv2.INTER_NEAREST)
    resized = np.where(resized > 127, np.uint8(255), np.uint8(0))
    dem_png_path = Path(dem_png_path)
    out = (
        Path(output_path)
        if output_path
        else dem_png_path.parent / f"{dem_png_path.stem}_mask_resized.png"
    )
    cv2.imwrite(str(out), resized)
    return out


class MaskPipeline:
    """Runs the four detectors and combines their outputs."""

    def __init__(self, config: Optional[Dict] = None, max_workers: int = 8):
        cfg = config or {}
        self.detectors = {
            MaskType.ROADS: RoadDetector(cfg.get("roads") or {}),
            MaskType.BUILDINGS: BuildingDetector(cfg.get("buildings") or {}),
            MaskType.VEGETATION: VegetationDetector(cfg.get("vegetation") or {}),
            MaskType.FIELDS: FieldDetector(cfg.get("fields") or {}),
        }
        self.max_workers = max_workers

    def process_image(
        self, image: np.ndarray | str | Path
    ) -> Dict[MaskType, np.ndarray]:
        """All masks for one BGR aerial image (array or path)."""
        if isinstance(image, (str, Path)):
            arr = cv2.imread(str(image))
            if arr is None:
                raise ValueError(f"cannot read image: {image}")
        else:
            arr = image
        masks = {
            kind: det.detect(arr) for kind, det in self.detectors.items()
        }
        masks[MaskType.COMBINED] = combine_masks(masks)
        return masks

    def process_batch(
        self, image_paths: Sequence[str | Path]
    ) -> List[Optional[Dict[MaskType, np.ndarray]]]:
        """Thread-parallel mask generation across many tiles."""
        def one(p):
            try:
                return self.process_image(p)
            except Exception as e:
                logger.error("mask generation failed for %s: %s", p, e)
                return None

        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            return list(pool.map(one, image_paths))
