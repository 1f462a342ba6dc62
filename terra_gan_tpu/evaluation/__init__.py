"""Evaluation: image quality, boundary, mask-agreement metrics; inference."""

from .inference import (
    evaluate,
    inpaint_directory,
    inpaint_with_gan,
    load_generator_variables,
)
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
    "evaluate",
    "inpaint_directory",
    "inpaint_with_gan",
    "load_generator_variables",
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
