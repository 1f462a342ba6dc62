"""Visualization helpers: DSM colorizer, mask panels, split maps."""

from .colorizer import DSMColorizer, build_lut
from .mask_viz import visualize_masks
from .split_viz import SplitVisualizer, create_split_visualization

__all__ = [
    "DSMColorizer",
    "SplitVisualizer",
    "build_lut",
    "create_split_visualization",
    "visualize_masks",
]
