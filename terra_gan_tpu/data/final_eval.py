"""Held-out grid preparation for final evaluation.

Contract (reference: utils/final_eval_grid_processor.py:44-118): copy
the raw DEM PNGs and *_mask_resized.png masks of a held-out parent
grid (default NS83) from processed/<grid>/raw into
processed/<grid>/test/{images,masks}, so the evaluate mode sees them
as test tiles.
"""

from __future__ import annotations

import logging
import shutil
from pathlib import Path
from typing import Tuple

from ..config import Config

logger = logging.getLogger(__name__)

DEFAULT_GRID = "NS83"


def process_raw_files(
    config: Config, grid: str = DEFAULT_GRID
) -> Tuple[int, int]:
    """Copy raw DEMs/masks of `grid` into its test split dirs.

    Returns (n_images, n_masks) copied.
    """
    raw_dir = Path(config.data.processed_dir) / grid / "raw"
    test_images = Path(config.data.processed_dir) / grid / "test" / "images"
    test_masks = Path(config.data.processed_dir) / grid / "test" / "masks"
    test_images.mkdir(parents=True, exist_ok=True)
    test_masks.mkdir(parents=True, exist_ok=True)

    if not raw_dir.exists():
        logger.error("raw dir missing: %s", raw_dir)
        return 0, 0

    n_img = n_mask = 0
    for png in sorted(raw_dir.glob("*.png")):
        if png.stem.endswith("_mask_resized"):
            shutil.copy2(png, test_masks / png.name)
            n_mask += 1
        else:
            shutil.copy2(png, test_images / png.name)
            n_img += 1
    logger.info("%s: copied %d images, %d masks to test/", grid, n_img, n_mask)
    return n_img, n_mask


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="Prepare held-out grid for eval")
    p.add_argument("--grid", default=DEFAULT_GRID)
    p.add_argument("--config", default="config.yaml")
    args = p.parse_args(argv)
    process_raw_files(Config.load(args.config), args.grid)


if __name__ == "__main__":
    main()
