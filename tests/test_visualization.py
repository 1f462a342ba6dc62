"""Visualization helpers + final-eval grid prep (PARITY gap closure)."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

cv2 = pytest.importorskip("cv2")

from terra_gan_tpu.config import Config
from terra_gan_tpu.data import process_raw_files
from terra_gan_tpu.data.mask_processing import MaskType
from terra_gan_tpu.data.visualization import (
    SplitVisualizer,
    create_split_visualization,
    visualize_masks,
)


def test_visualize_masks_panel(tmp_path):
    rng = np.random.default_rng(0)
    masks = {
        MaskType.ROADS: (rng.random((64, 64)) > 0.8).astype(np.uint8) * 255,
        MaskType.VEGETATION: np.zeros((64, 64), np.uint8),
        MaskType.COMBINED: np.full((64, 64), 255, np.uint8),
    }
    rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = visualize_masks(masks, tmp_path / "viz" / "panel.png", rgb)
    assert out.exists() and out.stat().st_size > 0


def test_split_visualization(tmp_path):
    meta = tmp_path / "metadata"
    meta.mkdir()
    mapping = {
        f"{x},{y}": ["train", "val", "test"][(x + y) % 3]
        for x in range(3) for y in range(3)
    }
    (meta / "split_mapping.json").write_text(json.dumps(mapping))
    out = create_split_visualization(meta, parent_grid="NJ05")
    assert out.exists()
    out2 = SplitVisualizer(meta).render(tmp_path / "alt.png")
    assert out2.exists()


def test_final_eval_grid_prep(tmp_path):
    cfg = Config.from_dict({
        "data": {"processed_dir": str(tmp_path / "proc")}
    })
    raw = tmp_path / "proc" / "NS83" / "raw"
    raw.mkdir(parents=True)
    img = Image.fromarray(np.zeros((16, 16), np.uint8))
    for tile in ("ns8030", "ns8031"):
        img.save(raw / f"{tile}.png")
        img.save(raw / f"{tile}_mask_resized.png")
    n_img, n_mask = process_raw_files(cfg, "NS83")
    assert (n_img, n_mask) == (2, 2)
    assert (tmp_path / "proc/NS83/test/images/ns8030.png").exists()
    assert (
        tmp_path / "proc/NS83/test/masks/ns8030_mask_resized.png"
    ).exists()
    # missing grid -> graceful zero
    assert process_raw_files(cfg, "NX00") == (0, 0)
