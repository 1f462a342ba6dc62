"""Evaluation: image quality, boundary, mask-agreement metrics; inference."""

from .inference import (
    evaluate,
    inpaint_directory,
    inpaint_with_gan,
    load_generator_variables,
)
from .random_masks import generate_batch, generate_dem_random_mask
from .scaffolding import (
    GANEvaluator,
    MetricsAggregator,
    ResultsManager,
    comparison_figure,
    sample_annotation_tiles,
)
from .statistics import StatisticalTester, cohens_d, interpret_effect_size
from .terrain import TerrainEvaluator
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
    "GANEvaluator",
    "MetricsAggregator",
    "ResultsManager",
    "StatisticalTester",
    "comparison_figure",
    "sample_annotation_tiles",
    "TerrainEvaluator",
    "cohens_d",
    "generate_batch",
    "generate_dem_random_mask",
    "interpret_effect_size",
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
