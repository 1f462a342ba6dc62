"""Data plumbing layer (SURVEY §2.2): ingestion, masks, splits, datasets."""

from .annotation_validator import AnnotationValidator, validate_annotations
from .asc import asc_to_png, normalize_tile, read_asc, write_asc
from .dataset import BatchLoader, DirectMatchDataset, InpaintingDataset
from .final_eval import process_raw_files
from .ingest import extract_target_folders, ingest_zip, parse_tile_xy
from .parallel import batch_process, process_images_in_parallel
from .paths import PathManager, is_valid_child_grid, is_valid_parent_grid
from .splitting import (
    GeographicalDataHandler,
    GeographicalSplitter,
    TileRecord,
    checkerboard_split,
)

__all__ = [
    "AnnotationValidator",
    "BatchLoader",
    "DirectMatchDataset",
    "GeographicalDataHandler",
    "GeographicalSplitter",
    "InpaintingDataset",
    "PathManager",
    "TileRecord",
    "asc_to_png",
    "batch_process",
    "checkerboard_split",
    "extract_target_folders",
    "ingest_zip",
    "is_valid_child_grid",
    "is_valid_parent_grid",
    "normalize_tile",
    "parse_tile_xy",
    "process_images_in_parallel",
    "process_raw_files",
    "read_asc",
    "validate_annotations",
    "write_asc",
]
