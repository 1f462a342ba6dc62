"""Random plausible-annotation mask generator (null-hypothesis baseline).

Reference: random__annotation_mask_generator.py:33-345. Produces masks
that *look like* human annotations for the deception study's
random-annotator baseline:

  * three styles — ridge strokes (random polylines, dilated + blurred),
    circular blobby patches, elliptical noise regions
  * white-fraction (annotated density) clamped to [1%, 30%]; output
    convention matches portal annotations: WHITE = flagged as AI
  * batch mode mirrors the held-out-grid tile naming
    (<GRID>_<tile>_inpainted_colored_random_mask.png) + a stats JSON
  * fully seeded for reproducibility
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

logger = logging.getLogger(__name__)

MIN_DENSITY = 0.01
MAX_DENSITY = 0.30


def _clamp_density(mask: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Iteratively dilate/erode the mask into the allowed density band."""
    kernel = np.ones((5, 5), np.uint8)
    for _ in range(50):
        frac = (mask > 0).mean()
        if frac < MIN_DENSITY:
            mask = cv2.dilate(mask, kernel)
        elif frac > MAX_DENSITY:
            mask = cv2.erode(mask, kernel)
        else:
            break
    if (mask > 0).mean() < MIN_DENSITY:
        # guarantee non-empty: stamp one random blob
        h, w = mask.shape
        cy, cx = rng.integers(h // 4, 3 * h // 4), rng.integers(w // 4, 3 * w // 4)
        cv2.circle(mask, (int(cx), int(cy)), max(4, h // 16), 255, -1)
    return mask


def ridge_mask(
    size: int, rng: np.random.Generator, n_strokes: Optional[int] = None
) -> np.ndarray:
    """Polyline 'ridge' strokes: random walks drawn thick, then blurred."""
    mask = np.zeros((size, size), np.uint8)
    for _ in range(n_strokes or rng.integers(2, 6)):
        n_pts = rng.integers(3, 8)
        pts = rng.integers(0, size, (n_pts, 2)).astype(np.int32)
        thickness = int(rng.integers(2, max(3, size // 40)))
        cv2.polylines(mask, [pts], False, 255, thickness)
    mask = cv2.dilate(mask, np.ones((3, 3), np.uint8), iterations=2)
    mask = cv2.GaussianBlur(mask, (7, 7), 0)
    mask = (mask > 64).astype(np.uint8) * 255
    return _clamp_density(mask, rng)


def patch_mask(
    size: int, rng: np.random.Generator, n_patches: Optional[int] = None
) -> np.ndarray:
    """Circular patches with noisy edges."""
    mask = np.zeros((size, size), np.uint8)
    for _ in range(n_patches or rng.integers(2, 6)):
        cy, cx = rng.integers(0, size, 2)
        radius = int(rng.integers(size // 20, size // 6))
        cv2.circle(mask, (int(cx), int(cy)), radius, 255, -1)
    noise = (rng.random((size, size)) > 0.5).astype(np.uint8) * 255
    edge = cv2.dilate(mask, np.ones((9, 9), np.uint8)) - mask
    mask = cv2.bitwise_or(mask, cv2.bitwise_and(edge, noise))
    return _clamp_density(mask, rng)


def region_mask(
    size: int, rng: np.random.Generator, n_regions: Optional[int] = None
) -> np.ndarray:
    """Rotated ellipses intersected with smooth noise."""
    mask = np.zeros((size, size), np.uint8)
    for _ in range(n_regions or rng.integers(1, 4)):
        cy, cx = rng.integers(0, size, 2)
        axes = (
            int(rng.integers(size // 16, size // 4)),
            int(rng.integers(size // 16, size // 4)),
        )
        angle = float(rng.uniform(0, 180))
        cv2.ellipse(
            mask, (int(cx), int(cy)), axes, angle, 0, 360, 255, -1
        )
    smooth = cv2.GaussianBlur(
        (rng.random((size, size)) * 255).astype(np.uint8), (31, 31), 0
    )
    mask = cv2.bitwise_and(mask, (smooth > 100).astype(np.uint8) * 255)
    return _clamp_density(mask, rng)


GENERATORS = {"ridge": ridge_mask, "patch": patch_mask, "region": region_mask}


def generate_dem_random_mask(
    size: int = 512,
    seed: Optional[int] = None,
    style: Optional[str] = None,
) -> np.ndarray:
    """One random annotation-like mask (uint8 {0,255}, WHITE=flagged)."""
    rng = np.random.default_rng(seed)
    if style is None:
        style = list(GENERATORS)[rng.integers(0, len(GENERATORS))]
    return GENERATORS[style](size, rng)


def generate_batch(
    output_dir: str | Path,
    tile_names: Sequence[str],
    grid: str = "NS83",
    size: int = 512,
    seed: int = 0,
) -> Dict:
    """Masks for a tile list with held-out-grid naming + stats JSON."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    stats: Dict = {"grid": grid, "seed": seed, "tiles": {}}
    for i, tile in enumerate(tile_names):
        mask = generate_dem_random_mask(size, seed=seed + i)
        name = f"{grid}_{tile}_inpainted_colored_random_mask.png"
        cv2.imwrite(str(output_dir / name), mask)
        stats["tiles"][tile] = {
            "file": name,
            "density": float((mask > 0).mean()),
        }
    densities = [t["density"] for t in stats["tiles"].values()]
    stats["mean_density"] = float(np.mean(densities)) if densities else 0.0
    with open(output_dir / "random_mask_stats.json", "w") as f:
        json.dump(stats, f, indent=2)
    return stats


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Random annotation baseline masks")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--grid", default="NS83")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--tiles", nargs="*",
        help="tile names; default = the 10x10 <grid-lowercase>XY layout",
    )
    args = p.parse_args(argv)
    tiles = args.tiles
    if not tiles:
        prefix = args.grid[:2].lower()
        base = args.grid[2:]
        # 10x10 child layout, e.g. ns8030 for NS83
        tiles = [
            f"{prefix}{base[0]}{x}{base[1]}{y}"
            for x in range(10) for y in range(10)
        ]
    stats = generate_batch(
        args.output_dir, tiles, grid=args.grid, size=args.size, seed=args.seed
    )
    print(json.dumps({"tiles": len(stats["tiles"]),
                      "mean_density": stats["mean_density"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
