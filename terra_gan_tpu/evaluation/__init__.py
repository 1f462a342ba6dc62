"""Evaluation: image quality, boundary, mask-agreement metrics."""

from .metrics import (
    MaskEvaluator,
    MaskMetrics,
    boundary_quality,
    image_quality_metrics,
    l1_l2,
    mse,
    psnr,
    resource_metrics,
    ssim,
)

__all__ = [
    "MaskEvaluator",
    "MaskMetrics",
    "boundary_quality",
    "image_quality_metrics",
    "l1_l2",
    "mse",
    "psnr",
    "resource_metrics",
    "ssim",
]
