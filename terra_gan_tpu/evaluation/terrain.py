"""Human-deception terrain evaluation (reference: evaluate_terrain.py).

Compares original inpainting masks (ground truth: WHITE=preserved,
BLACK=AI-generated) against human annotations (WHITE=flagged as AI):

  * IoU / precision / recall / F1 on the *inverted* ground truth
    (AI-generated = positive class) (evaluate_terrain.py:117-150)
  * largest contiguous undetected AI region in km^2 via connected
    components at `resolution_meters` (default 0.25 m/px)
    (evaluate_terrain.py:152-179)
  * undetected percentage of AI terrain (evaluate_terrain.py:181-200)
  * aggregate JSON with per-image values, means, best/worst F1,
    max unidentified area, and a "deception success rate" summary
    (= mean undetected %) (evaluate_terrain.py:202-395)

Tile matching handles both filename shapes:
  <GRID>_<tile>_inpainted... (annotations) and <tile>_mask... (masks).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _connected_component_sizes(binary: np.ndarray) -> np.ndarray:
    from scipy import ndimage

    labeled, n = ndimage.label(binary)
    if n == 0:
        return np.zeros((0,), np.int64)
    return np.bincount(labeled.ravel())[1:]


class TerrainEvaluator:
    def __init__(
        self,
        original_masks_dir: str | Path,
        final_annotations_dir: str | Path,
        resolution_meters: float = 0.25,
        debug: bool = False,
    ):
        self.original_masks_dir = Path(original_masks_dir)
        self.final_annotations_dir = Path(final_annotations_dir)
        self.resolution_meters = resolution_meters
        self.debug = debug
        if not self.original_masks_dir.exists():
            raise FileNotFoundError(self.original_masks_dir)
        if not self.final_annotations_dir.exists():
            raise FileNotFoundError(self.final_annotations_dir)
        self.original_files = sorted(self.original_masks_dir.glob("*.png"))
        self.annotation_files = sorted(self.final_annotations_dir.glob("*.png"))
        self.results: Dict = {}

    @staticmethod
    def extract_tile_id(filename: str) -> Optional[str]:
        m = re.search(r"[A-Z]{2}\d{2}_([a-z]{2}\d+)_inpainted", filename)
        if m:
            return m.group(1)
        m = re.search(r"([a-z]{2}\d+)_mask", filename)
        if m:
            return m.group(1)
        return None

    def find_matching_pairs(self) -> List[Dict]:
        annotations = {}
        for f in self.annotation_files:
            tid = self.extract_tile_id(f.name)
            if tid:
                annotations[tid] = f
        pairs = []
        for f in self.original_files:
            tid = self.extract_tile_id(f.name)
            if tid and tid in annotations:
                pairs.append(
                    {"original_mask": f, "annotation": annotations[tid],
                     "tile_id": tid}
                )
        return pairs

    # -- per-pair metrics (annotation, ground truth as bool arrays) --------
    @staticmethod
    def calculate_iou(anno: np.ndarray, gt: np.ndarray) -> float:
        ai = ~gt  # BLACK in the original mask = AI-generated = positive
        inter = np.logical_and(anno, ai).sum()
        union = np.logical_or(anno, ai).sum()
        return float(inter / union) if union else 0.0

    @staticmethod
    def calculate_precision_recall_f1(
        anno: np.ndarray, gt: np.ndarray
    ) -> Tuple[float, float, float]:
        ai = ~gt
        tp = np.logical_and(anno, ai).sum()
        fp = np.logical_and(anno, ~ai).sum()
        fn = np.logical_and(~anno, ai).sum()
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall
            else 0.0
        )
        return float(precision), float(recall), float(f1)

    def calculate_largest_unidentified_area(
        self, anno: np.ndarray, gt: np.ndarray
    ) -> float:
        undetected = np.logical_and(~gt, ~anno)
        sizes = _connected_component_sizes(undetected)
        if sizes.size == 0:
            return 0.0
        return float(
            sizes.max() * self.resolution_meters ** 2 / 1_000_000
        )

    @staticmethod
    def calculate_undetected_percentage(
        anno: np.ndarray, gt: np.ndarray
    ) -> float:
        ai = ~gt
        total = ai.sum()
        if total == 0:
            return 0.0
        undetected = np.logical_and(ai, ~anno).sum()
        return float(undetected / total * 100.0)

    # -- driver ------------------------------------------------------------
    def evaluate_all(self) -> Dict:
        per_image: Dict[str, Dict[str, float]] = {}
        for pair in self.find_matching_pairs():
            try:
                gt = (
                    cv2.imread(
                        str(pair["original_mask"]), cv2.IMREAD_GRAYSCALE
                    )
                    > 127
                )
                anno = (
                    cv2.imread(str(pair["annotation"]), cv2.IMREAD_GRAYSCALE)
                    > 127
                )
                if gt.shape != anno.shape:
                    anno = (
                        cv2.resize(
                            anno.astype(np.uint8),
                            (gt.shape[1], gt.shape[0]),
                            interpolation=cv2.INTER_NEAREST,
                        )
                        > 0
                    )
                p, r, f1 = self.calculate_precision_recall_f1(anno, gt)
                per_image[pair["tile_id"]] = {
                    "iou": self.calculate_iou(anno, gt),
                    "precision": p,
                    "recall": r,
                    "f1": f1,
                    "largest_unidentified_area_sq_km": (
                        self.calculate_largest_unidentified_area(anno, gt)
                    ),
                    "undetected_percentage": (
                        self.calculate_undetected_percentage(anno, gt)
                    ),
                }
            except Exception as e:
                if self.debug:
                    print(f"error on {pair['tile_id']}: {e}")

        n = len(per_image)
        aggregate: Dict = {"total_images": n}
        metric_keys = [
            "iou", "precision", "recall", "f1",
            "largest_unidentified_area_sq_km", "undetected_percentage",
        ]
        for key in metric_keys:
            name = (
                f"mean_{key}" if key != "largest_unidentified_area_sq_km"
                else "mean_largest_unidentified_area_sq_km"
            )
            aggregate[name] = (
                sum(v[key] for v in per_image.values()) / n if n else 0.0
            )
        if n:
            by_f1 = sorted(per_image.items(), key=lambda kv: kv[1]["f1"])
            aggregate["best_f1_image"] = {
                "name": by_f1[-1][0], "f1": by_f1[-1][1]["f1"]
            }
            aggregate["worst_f1_image"] = {
                "name": by_f1[0][0], "f1": by_f1[0][1]["f1"]
            }
            aggregate["max_unidentified_area_sq_km"] = max(
                v["largest_unidentified_area_sq_km"]
                for v in per_image.values()
            )
        self.results = {"per_image": per_image, "aggregate": aggregate}
        return self.results

    def save_results(self, output_path: str | Path) -> None:
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(self.results, f, indent=2)

    def get_summary(self) -> str:
        agg = self.results.get("aggregate", {})
        per = self.results.get("per_image", {})
        deception = agg.get("mean_undetected_percentage", 0.0)
        by_deception = sorted(
            ((k, v["undetected_percentage"]) for k, v in per.items()),
            key=lambda kv: kv[1],
            reverse=True,
        )
        bar_len = 40
        filled = int(round(deception / 100.0 * bar_len))
        bar = "[" + "|" * filled + "-" * (bar_len - filled) + "]"
        lines = [
            "=== Terrain Deception Evaluation ===",
            f"Images evaluated: {agg.get('total_images', 0)}",
            f"Mean IoU: {agg.get('mean_iou', 0):.4f}",
            f"Mean precision: {agg.get('mean_precision', 0):.4f}",
            f"Mean recall: {agg.get('mean_recall', 0):.4f}",
            f"Mean F1: {agg.get('mean_f1', 0):.4f}",
            f"Mean largest undetected region: "
            f"{agg.get('mean_largest_unidentified_area_sq_km', 0):.4f} km^2",
            f"Deception success rate (mean undetected %): {deception:.1f}%",
            f"  {bar}",
        ]
        if by_deception:
            lines.append("Most convincing tiles:")
            lines += [
                f"  - {k}: {v:.1f}% undetected" for k, v in by_deception[:3]
            ]
            lines.append("Least convincing tiles:")
            lines += [
                f"  - {k}: {v:.1f}% undetected" for k, v in by_deception[-3:]
            ]
        return "\n".join(lines)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Terrain deception evaluation")
    p.add_argument("--original-masks", required=True)
    p.add_argument("--final-annotations", required=True)
    p.add_argument("--output-file", required=True)
    p.add_argument("--resolution", type=float, default=0.25)
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)
    ev = TerrainEvaluator(
        args.original_masks, args.final_annotations,
        resolution_meters=args.resolution, debug=args.debug,
    )
    ev.evaluate_all()
    ev.save_results(args.output_file)
    print(ev.get_summary())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
