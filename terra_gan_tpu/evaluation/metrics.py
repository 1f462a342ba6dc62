"""Image-quality, boundary, and resource metrics.

jnp ports of the reference metric stack, NHWC, jit-friendly (no
data-dependent branching — inf/0 special cases via jnp.where):

  * PSNR (20*log10(1/sqrt(mse)); inf when mse == 0)
    (mvp_gan/src/evaluation/metrics.py:47-54)
  * SSIM with an 11x11 *uniform* window (torch avg_pool2d with
    count_include_pad=True — the divisor is always window^2 even at
    borders; reproduced with a reduce_window sum / k^2)
    (metrics.py:56-77)
  * L1/L2 distances (mvp_gan/src/utils/metrics.py:42-46)
  * boundary quality: MSE/PSNR over the 3x3 morphology band +
    mean-|diff| gradient proxy (evaluation/metrics.py:79-133)
  * MaskEvaluator: cv2 contour features over binary masks
    (evaluation/metrics.py:23-45)
  * host resource telemetry via psutil + jax device memory stats
    (replacing GPUtil; utils/metrics.py:71-102)
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..losses.inpainting import boundary_band

logger = logging.getLogger(__name__)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    m = mse(pred, target)
    return jnp.where(
        m == 0, jnp.inf, 20.0 * jnp.log10(max_val / jnp.sqrt(m))
    )


def _uniform_filter(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """avg_pool2d(stride 1, pad k//2, count_include_pad=True) on NHWC."""
    s = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)),
    )
    return s / float(k * k)


def ssim(
    pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11
) -> jnp.ndarray:
    """Uniform-window SSIM, exact to the reference formula."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mu1 = _uniform_filter(p, window_size)
    mu2 = _uniform_filter(t, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = _uniform_filter(p * p, window_size) - mu1_sq
    sigma2 = _uniform_filter(t * t, window_size) - mu2_sq
    sigma12 = _uniform_filter(p * t, window_size) - mu1_mu2
    num = (2 * mu1_mu2 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2)
    return jnp.mean(num / den)


def l1_l2(pred: jnp.ndarray, target: jnp.ndarray):
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.abs(d)), jnp.sqrt(jnp.mean(jnp.square(d)))


def image_quality_metrics(
    pred: jnp.ndarray, target: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    l1, l2 = l1_l2(pred, target)
    return {
        "psnr": psnr(pred, target),
        "ssim": ssim(pred, target),
        "l1_distance": l1,
        "l2_distance": l2,
    }


def boundary_quality(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Boundary-band MSE/PSNR + gradient-difference proxy (jit-safe)."""
    band = boundary_band(mask)
    empty = jnp.sum(band) < 1e-6
    b_mse = jnp.mean(jnp.square((pred - target) * band))
    b_psnr = 10.0 * jnp.log10(1.0 / (b_mse + 1e-6))

    def mean_tv(x):
        return (
            jnp.mean(jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]))
            + jnp.mean(jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]))
        )

    grad_diff = jnp.abs(mean_tv(pred) - mean_tv(target))
    zero = jnp.asarray(0.0, jnp.float32)
    return {
        "boundary_mse": jnp.where(empty, zero, b_mse),
        "boundary_psnr": jnp.where(empty, zero, b_psnr),
        "boundary_gradient_diff": jnp.where(empty, zero, grad_diff),
    }


@dataclass
class MaskMetrics:
    iou: float
    precision: float
    recall: float
    total_area: int
    feature_count: int
    average_feature_size: float


class MaskEvaluator:
    """Binary-mask agreement metrics + contour features (host-side cv2)."""

    def __init__(self, config: Optional[Dict] = None):
        self.config = config or {}

    def _features(self, mask: np.ndarray) -> List:
        import cv2

        m = (np.asarray(mask) > 0).astype(np.uint8) * 255
        contours, _ = cv2.findContours(
            m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        return contours

    def calculate_metrics(
        self, pred_mask: np.ndarray, target_mask: np.ndarray
    ) -> MaskMetrics:
        p = np.asarray(pred_mask) > 0
        t = np.asarray(target_mask) > 0
        inter = np.logical_and(p, t).sum()
        union = np.logical_or(p, t).sum()
        iou = float(inter / union) if union else 0.0
        precision = float(inter / p.sum()) if p.sum() else 0.0
        recall = float(inter / t.sum()) if t.sum() else 0.0
        contours = self._features(p)
        total_area = int(p.sum())
        n = len(contours)
        return MaskMetrics(
            iou=iou,
            precision=precision,
            recall=recall,
            total_area=total_area,
            feature_count=n,
            average_feature_size=total_area / n if n else 0.0,
        )

    def evaluate_batch(
        self,
        pred_masks: Sequence[np.ndarray],
        target_masks: Sequence[np.ndarray],
    ) -> List[MaskMetrics]:
        return [
            self.calculate_metrics(p, t)
            for p, t in zip(pred_masks, target_masks)
        ]

    def save_results(self, metrics: MaskMetrics, save_path: Path) -> None:
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        with open(save_path, "a") as f:
            f.write(f"{metrics.__dict__}\n")


def resource_metrics() -> Dict[str, float]:
    """Host CPU/memory + per-device accelerator memory telemetry."""
    out: Dict[str, float] = {}
    try:
        import psutil

        out["cpu_percent"] = psutil.cpu_percent()
        out["memory_percent"] = psutil.virtual_memory().percent
    except Exception:  # pragma: no cover
        pass
    try:
        for i, dev in enumerate(jax.local_devices()):
            stats = dev.memory_stats() or {}
            if "bytes_in_use" in stats:
                out[f"device_{i}_memory_mb"] = stats["bytes_in_use"] / 2**20
            if "peak_bytes_in_use" in stats:
                out[f"device_{i}_peak_memory_mb"] = (
                    stats["peak_bytes_in_use"] / 2**20
                )
    except Exception:
        pass
    return out
