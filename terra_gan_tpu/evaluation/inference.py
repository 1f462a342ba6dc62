"""Tile inference: single-tile API parity + grid-scale batched path.

Single-tile contract (reference: mvp_gan/src/evaluate.py:8-59):
load image+mask grayscale -> resize 512x512 -> binarize mask at >0 ->
masked = img*mask -> generator forward (eval mode) -> save uint8 PNG
resized to 500x500 (bilinear). Accepts a live model+variables or a
checkpoint path (.pth master dict or raw generator state dict).

Grid-scale path: the reference loops tiles at batch 1
(main_pipeline.py:513-525) — `inpaint_directory` instead stacks the
whole test split, shards it over the mesh via BatchedInpainter, and
writes outputs concurrently on host threads. This is the main
throughput win of the rebuild (SURVEY §3.2).
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from PIL import Image

from ..models.generator import PConvUNet
from ..utils.torch_compat import load_pth, torch_state_to_generator_vars

logger = logging.getLogger(__name__)

MODEL_SIZE = 512
OUTPUT_SIZE = 500  # reference saves 500x500 (evaluate.py:57-58)


def load_generator_variables(checkpoint_path: str | Path) -> Dict[str, Any]:
    """Load generator variables from a reference-layout .pth."""
    obj = load_pth(checkpoint_path)
    if isinstance(obj, dict) and "generator_state_dict" in obj:
        sd = obj["generator_state_dict"]
    elif isinstance(obj, dict) and "model_state_dict" in obj:
        sd = obj["model_state_dict"]  # HG trainer layout
    else:
        sd = obj
    return torch_state_to_generator_vars(sd)


def _load_pair(
    image_path: str | Path, mask_path: str | Path, size: int = MODEL_SIZE
) -> Tuple[np.ndarray, np.ndarray]:
    img = Image.open(image_path).convert("L").resize(
        (size, size), Image.BILINEAR
    )
    mask = Image.open(mask_path).convert("L").resize(
        (size, size), Image.BILINEAR
    )
    x = np.asarray(img, np.float32)[None, ..., None] / 255.0
    m = (np.asarray(mask, np.float32)[None, ..., None] > 0).astype(np.float32)
    return x, m


def save_tile(
    array01: np.ndarray, path: str | Path, out_size: int = OUTPUT_SIZE
) -> None:
    """[H,W] float in [0,1] (or pre-quantized uint8) -> PNG at out_size."""
    if array01.dtype == np.uint8:
        u8 = array01  # already device-quantized (parallel/infer.py)
    else:
        u8 = (np.clip(array01, 0.0, 1.0) * 255.0).astype(np.uint8)
    img = Image.fromarray(u8, mode="L")
    if out_size and img.size != (out_size, out_size):
        img = img.resize((out_size, out_size), Image.BILINEAR)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    # zlib level 3: ~25% faster encode than PIL's default 6 at equal
    # file size for these tiles (measured r2); pixels are identical
    img.save(path, compress_level=3)


# jit forwards cached per generator module (flax modules are immutable
# and hashable; an id()-keyed cache could alias after GC)
_JIT_CACHE: Dict[Any, Any] = {}


def evaluate(
    image_path: str | Path,
    mask_path: str | Path,
    model_or_checkpoint,
    save_path: str | Path,
    variables: Optional[Dict[str, Any]] = None,
) -> Path:
    """Single-tile inpainting with the reference's exact I/O contract."""
    if isinstance(model_or_checkpoint, (str, Path)):
        generator = PConvUNet()
        variables = load_generator_variables(model_or_checkpoint)
    else:
        generator = model_or_checkpoint
        if variables is None:
            raise ValueError("variables required with a live model")

    x, m = _load_pair(image_path, mask_path)
    fwd = _JIT_CACHE.get(generator)
    if fwd is None:
        fwd = jax.jit(
            lambda v, i, mk, g=generator: g.apply(v, i * mk, mk, False)
        )
        _JIT_CACHE[generator] = fwd
    out = np.asarray(fwd(variables, x, m))[0, ..., 0]
    save_tile(out, save_path)
    return Path(save_path)


def inpaint_directory(
    generator,
    variables: Dict[str, Any],
    images_dir: str | Path,
    masks_dir: str | Path,
    output_dir: str | Path,
    mesh=None,
    # single-chip throughput rises monotonically with batch up to the
    # HBM limit: 620 t/s @32 -> 1035 t/s @128 on v5e; 192 OOMs 16 GB
    # (BASELINE.md r2 batch sweep). Multi-chip meshes shard the chunk,
    # so larger values amortize further there too.
    chunk: int = 128,
    model_size: int = MODEL_SIZE,
    out_size: int = OUTPUT_SIZE,
    io_workers: int = 8,
) -> List[Path]:
    """Batched, mesh-sharded inpainting of a whole test split.

    Pairs <stem>.png with <stem>_mask_resized.png; writes
    <stem>_inpainted.png at out_size. Decode and encode run on host
    thread pools; the device sees one large sharded batch per chunk.
    """
    from ..parallel.infer import BatchedInpainter

    images_dir, masks_dir = Path(images_dir), Path(masks_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    pairs = []
    for img_path in sorted(images_dir.glob("*.png")):
        if img_path.stem.endswith("_mask_resized"):
            continue
        mask_path = masks_dir / f"{img_path.stem}_mask_resized.png"
        if mask_path.exists():
            pairs.append((img_path, mask_path))
        else:
            logger.warning("no mask for %s", img_path.stem)
    if not pairs:
        return []

    def load_or_none(p):
        try:
            return _load_pair(*p, size=model_size)
        except Exception as e:
            # reference behavior: skip the bad tile, keep the grid
            # going (main_pipeline.py:528-530)
            logger.error("tile %s failed to load, skipping: %s", p[0].stem, e)
            return None

    with ThreadPoolExecutor(max_workers=io_workers) as pool:
        loaded = list(pool.map(load_or_none, pairs))
    pairs = [p for p, ld in zip(pairs, loaded) if ld is not None]
    loaded = [ld for ld in loaded if ld is not None]
    if not loaded:
        return []
    images = np.concatenate([x for x, _ in loaded], axis=0)
    masks = np.concatenate([m for _, m in loaded], axis=0)

    # quantize on device: the host only ever writes uint8 PNGs, and
    # fetching 1 byte/px instead of 4 relieves the device->host link
    # (the e2e bottleneck — BASELINE.md r2 grid-e2e analysis)
    inpainter = BatchedInpainter(
        generator, variables, mesh=mesh, chunk=chunk, quantize_uint8=True
    )
    outputs = inpainter(images, masks)

    def write(i: int) -> Path:
        stem = pairs[i][0].stem
        path = output_dir / f"{stem}_inpainted.png"
        save_tile(outputs[i, ..., 0], path, out_size)
        return path

    with ThreadPoolExecutor(max_workers=io_workers) as pool:
        return list(pool.map(write, range(len(pairs))))


def inpaint_with_gan(
    dem_path: str | Path,
    mask_path: str | Path,
    output_dir: str | Path,
    checkpoint_path: str | Path,
) -> Path:
    """Facade matching utils/gan_inpainting.py:5-19."""
    out = Path(output_dir) / f"{Path(dem_path).stem}_inpainted.png"
    return evaluate(dem_path, mask_path, checkpoint_path, out)
