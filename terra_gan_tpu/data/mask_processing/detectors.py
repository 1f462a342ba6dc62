"""Feature detectors over 25 cm RGB aerial tiles (host-side OpenCV).

These produce the inpainting masks: detected man-made/vegetation
features become holes for the GAN to fill. They run at data-prep time
on the host (cv2 primitives — Canny/Hough/contours have no TPU
analogue worth building; SURVEY §7.2 keeps them host-side but batches
across tiles, see pipeline.py).

Behavior contracts (reference files in utils/mask_processing/processors/):
  * roads (road_processor.py:10-59): CLAHE-enhanced gray -> bilateral
    filter -> Canny(lo,hi) -> remove HSV-green pixels -> probabilistic
    Hough -> keep lines near 0deg/45ish/90deg -> draw at line_thickness
    -> 3x3 morphological close.
  * buildings (building_processor.py:12-22): intentionally a stub —
    returns an empty mask (config slot reserved for a future
    segmentation model).
  * vegetation (vegetation_processor.py:10-51): HSV green range AND
    Excess-Green-Index threshold -> close/open -> drop contours under
    min_area.
  * fields (field_processor.py:10-46): LAB-L bilateral -> inverse
    adaptive Gaussian threshold -> remove vegetation -> close/open ->
    area filter.

Each detector returns a uint8 {0,255} mask with 255 = detected.
Failures return an all-zero mask (reference's log-and-continue).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this env
    cv2 = None

logger = logging.getLogger(__name__)

_HSV_GREEN_LO = np.array([35, 50, 50], np.uint8)
_HSV_GREEN_HI = np.array([85, 255, 255], np.uint8)


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("mask detectors require OpenCV (cv2)")


def _empty_like(image: np.ndarray) -> np.ndarray:
    h, w = image.shape[:2]
    return np.zeros((h, w), np.uint8)


def _green_mask(image_bgr: np.ndarray) -> np.ndarray:
    hsv = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2HSV)
    return cv2.inRange(hsv, _HSV_GREEN_LO, _HSV_GREEN_HI)


def _keep_large_contours(mask: np.ndarray, min_area: float) -> np.ndarray:
    contours, _ = cv2.findContours(
        mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    out = np.zeros_like(mask)
    for c in contours:
        if cv2.contourArea(c) > min_area:
            cv2.drawContours(out, [c], -1, 255, -1)
    return out


class RoadDetector:
    def __init__(self, config: Optional[Dict] = None):
        cfg = config or {}
        self.canny_low = cfg.get("canny_low", 150)
        self.canny_high = cfg.get("canny_high", 300)
        self.hough_threshold = cfg.get("hough_threshold", 100)
        self.hough_min_length = cfg.get("hough_min_length", 100)
        self.hough_max_gap = cfg.get("hough_max_gap", 20)
        self.line_thickness = cfg.get("line_thickness", 3)

    def detect(self, image: np.ndarray) -> np.ndarray:
        _require_cv2()
        try:
            gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
            clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
            smooth = cv2.bilateralFilter(clahe.apply(gray), 9, 75, 75)
            edges = cv2.Canny(smooth, self.canny_low, self.canny_high)
            edges = cv2.bitwise_and(
                edges, cv2.bitwise_not(_green_mask(image))
            )
            lines = cv2.HoughLinesP(
                edges,
                rho=1,
                theta=np.pi / 180,
                threshold=self.hough_threshold,
                minLineLength=self.hough_min_length,
                maxLineGap=self.hough_max_gap,
            )
            mask = np.zeros_like(gray)
            if lines is not None:
                # shape is (N,1,4) or (N,4) depending on cv2 version
                for x1, y1, x2, y2 in np.asarray(lines).reshape(-1, 4):
                    angle = abs(np.degrees(np.arctan2(y2 - y1, x2 - x1)))
                    if angle < 20 or abs(angle - 90) < 20 or abs(angle - 180) < 20:
                        cv2.line(
                            mask, (x1, y1), (x2, y2), 255, self.line_thickness
                        )
            kernel = np.ones((3, 3), np.uint8)
            return cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
        except Exception as e:  # log-and-continue, reference behavior
            logger.error("road detection failed: %s", e)
            return _empty_like(image)


class BuildingDetector:
    """Stub by contract: the reference reserves this for a future
    segmentation model and always returns an empty mask."""

    def __init__(self, config: Optional[Dict] = None):
        self.config = config or {}

    def detect(self, image: np.ndarray) -> np.ndarray:
        return _empty_like(image)


class VegetationDetector:
    def __init__(self, config: Optional[Dict] = None):
        cfg = config or {}
        self.min_area = cfg.get("min_area", 5000)
        self.kernel_size = cfg.get("morph_kernel_size", 5)

    def detect(self, image: np.ndarray) -> np.ndarray:
        _require_cv2()
        try:
            hsv = cv2.cvtColor(image, cv2.COLOR_BGR2HSV)
            hue_mask = cv2.inRange(
                hsv, np.array([30, 40, 40]), np.array([90, 255, 255])
            )
            b, g, r = [c.astype(np.float64) for c in cv2.split(image)]
            exg = 2.0 * g - r - b
            exg_u8 = cv2.normalize(exg, None, 0, 255, cv2.NORM_MINMAX).astype(
                np.uint8
            )
            _, exg_mask = cv2.threshold(exg_u8, 127, 255, cv2.THRESH_BINARY)
            combined = cv2.bitwise_and(hue_mask, exg_mask)
            kernel = np.ones((self.kernel_size, self.kernel_size), np.uint8)
            closed = cv2.morphologyEx(combined, cv2.MORPH_CLOSE, kernel)
            opened = cv2.morphologyEx(closed, cv2.MORPH_OPEN, kernel)
            return _keep_large_contours(opened, self.min_area)
        except Exception as e:
            logger.error("vegetation detection failed: %s", e)
            return _empty_like(image)


class FieldDetector:
    def __init__(self, config: Optional[Dict] = None):
        cfg = config or {}
        self.min_area = cfg.get("min_area", 10000)
        self.kernel_size = cfg.get("morph_kernel_size", 5)

    def detect(self, image: np.ndarray) -> np.ndarray:
        _require_cv2()
        try:
            lab_l = cv2.cvtColor(image, cv2.COLOR_BGR2LAB)[:, :, 0]
            smoothed = cv2.bilateralFilter(lab_l, 9, 75, 75)
            binary = cv2.adaptiveThreshold(
                smoothed, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                cv2.THRESH_BINARY_INV, 25, 3,
            )
            binary = cv2.bitwise_and(
                binary, cv2.bitwise_not(_green_mask(image))
            )
            kernel = np.ones((self.kernel_size, self.kernel_size), np.uint8)
            closed = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel)
            opened = cv2.morphologyEx(closed, cv2.MORPH_OPEN, kernel)
            return _keep_large_contours(opened, self.min_area)
        except Exception as e:
            logger.error("field detection failed: %s", e)
            return _empty_like(image)
