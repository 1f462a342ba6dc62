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
from ..utils.images import open_gray
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


def load_checkpoint_quant_scales(checkpoint_path: str | Path):
    """Frozen int8 calibration scales from a QAT-tail checkpoint, or
    None. Checkpoints produced by training.qat_tail carry the scales
    the fine-tune adapted the weights to (training/loop.py); deploying
    w8a8_resident_full at those exact scales is the quality contract —
    self-calibration on different tiles would shift the scales out from
    under the QAT'd weights."""
    try:
        obj = load_pth(checkpoint_path)
    except Exception:
        return None
    if isinstance(obj, dict):
        scales = obj.get("quant_scales")
        if isinstance(scales, dict) and scales:
            return {str(k): v for k, v in scales.items()}
    return None


def iter_tile_pairs(images_dir: str | Path, masks_dir: str | Path):
    """Yield (image_path, mask_path_or_None) for every ``<stem>.png``
    tile, paired via the split-directory convention
    ``<stem>_mask_resized.png`` (shared by grid inference and serving
    calibration)."""
    masks_dir = Path(masks_dir)
    for img_path in sorted(Path(images_dir).glob("*.png")):
        if img_path.stem.endswith("_mask_resized"):
            continue
        mask_path = masks_dir / f"{img_path.stem}_mask_resized.png"
        yield img_path, (mask_path if mask_path.exists() else None)


def load_calibration_tiles(
    calib_dir: str | Path, size: int = MODEL_SIZE, n_tiles: int = 16
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Up to n_tiles masked (image, mask) pairs as stacked [N,size,size,1]
    float arrays for w8a8 activation-scale calibration, or None if the
    directory holds no masked pairs.

    Shared by serving startup calibration (--calib-dir) and artifact
    export (--quant) so both accept the same layouts: tiles flat in
    calib_dir (``<stem>.png`` + ``<stem>_mask_resized.png``, the
    pipeline's split convention) or under ``calib_dir/{images,masks}``.
    Unmasked tiles are excluded — an all-ones mask means nothing to
    inpaint, and its activation statistics would skew the static scales
    (BASELINE.md r3: static scales from real masked tiles are the
    quality-preserving configuration)."""
    import itertools

    d = Path(calib_dir)
    img_dir, mask_dir = d, d
    if not any(d.glob("*.png")) and (d / "images").is_dir():
        img_dir, mask_dir = d / "images", d / "masks"
    pairs = list(itertools.islice(
        ((i, m) for i, m in iter_tile_pairs(img_dir, mask_dir)
         if m is not None),
        n_tiles,
    ))
    if not pairs:
        return None
    xs, ms = zip(*(_load_pair(i, m, size) for i, m in pairs))
    return np.concatenate(xs, axis=0), np.concatenate(ms, axis=0)


def _open_gray(path: str | Path) -> Image.Image:
    """Grayscale PIL image; native gray8 fast path (utils/images.py,
    shared with the training datasets)."""
    return open_gray(path)


def _load_pair(
    image_path: str | Path, mask_path: str | Path, size: int = MODEL_SIZE
) -> Tuple[np.ndarray, np.ndarray]:
    img = _open_gray(image_path).resize((size, size), Image.BILINEAR)
    mask = _open_gray(mask_path).resize((size, size), Image.BILINEAR)
    x = np.asarray(img, np.float32)[None, ..., None] / 255.0
    m = (np.asarray(mask, np.float32)[None, ..., None] > 0).astype(np.float32)
    return x, m


def _load_pair_u8(
    image_path: str | Path, mask_path: str | Path, size: int = MODEL_SIZE
) -> Tuple[np.ndarray, np.ndarray]:
    """Raw decoded bytes for the device-normalizing grid path.

    Same decode+resize as _load_pair but the float conversion moves on
    device (BatchedInpainter.forward: u8 -> f32 / 255, mask > 0 —
    bit-identical math), so the host->device transfer carries 1
    byte/px instead of 4. Pairs with quantize_uint8 on the fetch side:
    grid e2e moves raw bytes in BOTH directions (BASELINE.md r5)."""
    img = _open_gray(image_path).resize((size, size), Image.BILINEAR)
    mask = _open_gray(mask_path).resize((size, size), Image.BILINEAR)
    x = np.asarray(img, np.uint8)[None, ..., None]
    m = np.asarray(mask, np.uint8)[None, ..., None]
    return x, m


def save_tile(
    array01: np.ndarray, path: str | Path, out_size: int = OUTPUT_SIZE
) -> None:
    """[H,W] float in [0,1] (or pre-quantized uint8) -> PNG at out_size.

    Encoding goes through the native codec when available (Sub-filtered
    zlib-1 huffman-only, native/terra_io.cpp — measured ~6x faster than
    PIL at compress_level=3 AND smaller on DSM tiles; lossless either
    way, decoders see identical pixels), with PIL as the fallback.
    """
    if array01.dtype == np.uint8:
        u8 = array01  # already device-quantized (parallel/infer.py)
    else:
        u8 = (np.clip(array01, 0.0, 1.0) * 255.0).astype(np.uint8)
    if out_size and u8.shape != (out_size, out_size):
        img = Image.fromarray(u8, mode="L").resize(
            (out_size, out_size), Image.BILINEAR
        )
        u8 = np.asarray(img)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    from ..utils.native import png_encode_gray8

    data = png_encode_gray8(u8)
    if data is not None:
        path.write_bytes(data)
        return
    # zlib level 3: ~25% faster encode than PIL's default 6 at equal
    # file size for these tiles (measured r2); pixels are identical
    Image.fromarray(u8, mode="L").save(path, compress_level=3)


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
    # E2E window size. "auto" (default) probes one device->host fetch
    # round trip and picks the window + pipeline depth for the host
    # class (parallel/infer.auto_chunk_policy): relay-attached -> 128
    # monolithic (every fetch pays ~0.5 s RTT; r3 study: 15.0-16.6 t/s
    # vs 13.1-13.5 at 32), PCIe-class -> 32 with deeper prefetch
    # (decode/encode pipeline against compute). Fixed ints still
    # accepted. Device throughput peaks at batch 128 (1035 t/s, r2).
    chunk: int | str = "auto",
    model_size: int = MODEL_SIZE,
    out_size: int = OUTPUT_SIZE,
    io_workers: int = 8,
    # w8a8 eval quantization (ops/quant.py): self-calibrates activation
    # scales on the first window (one unquantized forward), then runs
    # the whole split through the int8 MXU path — measured 1.18x
    # model-level at the 512^2/batch-128 headline shape with hole-PSNR
    # parity on trained weights (BASELINE.md r3 int8 study)
    quant: Optional[str] = None,
    # pre-frozen calibration scales (a QAT-tail checkpoint's
    # load_checkpoint_quant_scales): skips self-calibration so the
    # deployed scales are exactly the ones the fine-tune saw
    quant_scales: Optional[Dict[str, Any]] = None,
) -> List[Path]:
    """Batched, mesh-sharded inpainting of a whole test split.

    Pairs <stem>.png with <stem>_mask_resized.png; writes
    <stem>_inpainted.png at out_size. Decode and encode run on host
    thread pools; the device sees one large sharded batch per chunk.
    """
    from ..parallel.infer import BatchedInpainter, auto_chunk_policy

    prefetch = 2
    if chunk == "auto":
        dev = mesh.devices.flat[0] if mesh is not None else None
        chunk, prefetch = auto_chunk_policy(dev)
        logger.info(
            "auto chunk policy: chunk=%d prefetch=%d", chunk, prefetch
        )

    images_dir, masks_dir = Path(images_dir), Path(masks_dir)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    pairs = []
    for img_path, mask_path in iter_tile_pairs(images_dir, masks_dir):
        if mask_path is None:
            logger.warning("no mask for %s", img_path.stem)
        else:
            pairs.append((img_path, mask_path))
    if not pairs:
        return []

    # quantize on device: the host only ever writes uint8 PNGs, and
    # fetching 1 byte/px instead of 4 relieves the device->host link
    # (the e2e bottleneck — BASELINE.md r2 grid-e2e analysis)
    inpainter = BatchedInpainter(
        generator, variables, mesh=mesh, chunk=chunk, quantize_uint8=True
    )
    step = inpainter.step
    windows = [pairs[i : i + step] for i in range(0, len(pairs), step)]

    def load_window(window):
        stems, imgs, msks = [], [], []
        for p in window:
            try:
                x, m = _load_pair_u8(*p, size=model_size)
            except Exception as e:
                # reference behavior: skip the bad tile, keep the grid
                # going (main_pipeline.py:528-530)
                logger.error(
                    "tile %s failed to load, skipping: %s", p[0].stem, e
                )
                continue
            stems.append(p[0].stem)
            imgs.append(x)
            msks.append(m)
        if not stems:
            return None
        return stems, np.concatenate(imgs), np.concatenate(msks)

    # three-stage host/device pipeline: decode(window i+1) runs on pool
    # threads while the device computes window i and the main thread
    # fetches it, while pool threads encode window i-1's PNGs. Decode,
    # zlib and the device fetch all release the GIL, so the stages
    # genuinely overlap even on small hosts; the reference does all
    # three strictly sequentially per tile (main_pipeline.py:497-539).
    results: List[Path] = []
    with ThreadPoolExecutor(max_workers=io_workers) as pool:

        def loaded_chunks():
            futs = [pool.submit(load_window, w) for w in windows[:prefetch]]
            nxt = prefetch
            while futs:
                res = futs.pop(0).result()
                if nxt < len(windows):
                    futs.append(pool.submit(load_window, windows[nxt]))
                    nxt += 1
                if res is not None:
                    yield res

        def encode_window(stems, out) -> List[Path]:
            paths = []
            for j, stem in enumerate(stems):
                path = output_dir / f"{stem}_inpainted.png"
                save_tile(out[j, ..., 0], path, out_size)
                paths.append(path)
            return paths

        try:
            gen_chunks = loaded_chunks()
            if quant is not None and quant_scales is not None:
                from ..ops.quant import quantized_clone

                inpainter = BatchedInpainter(
                    quantized_clone(generator, quant, quant_scales),
                    variables, mesh=mesh, chunk=chunk,
                    quantize_uint8=True,
                )
            elif quant is not None:
                from itertools import chain

                from ..ops.quant import calibrate_quant_scales, quantized_clone

                first = next(gen_chunks, None)
                if first is not None:
                    stems0, imgs0, msks0 = first
                    n = min(16, len(stems0))
                    # windows carry raw uint8 (device-normalizing path);
                    # calibration applies the exact same normalization
                    # on host (u8/255, mask > 0 — bit-identical)
                    cx = imgs0[:n].astype(np.float32) / 255.0
                    cm = (msks0[:n] > 0).astype(np.float32)
                    scales = calibrate_quant_scales(
                        generator, variables, [(cx * cm, cm)],
                    )
                    inpainter = BatchedInpainter(
                        quantized_clone(generator, quant, scales),
                        variables, mesh=mesh, chunk=chunk,
                        quantize_uint8=True,
                    )
                    gen_chunks = chain([first], gen_chunks)
            write_futs = [
                pool.submit(encode_window, stems, out)
                for stems, out in inpainter.stream_from(gen_chunks)
            ]
            for f in write_futs:
                results.extend(f.result())
        except Exception as e:
            # the 128 default is tuned to 16 GB v5e HBM; on smaller
            # accelerators retry at half the chunk instead of failing
            # (idempotent: finished tiles are simply rewritten)
            msg = str(e).lower()
            oom = "resource_exhausted" in msg or "out of memory" in msg
            if oom and step > inpainter.n_dev:
                logger.warning(
                    "chunk %d exhausted device memory; retrying at %d",
                    chunk, chunk // 2,
                )
                return inpaint_directory(
                    generator, variables, images_dir, masks_dir,
                    output_dir, mesh=mesh, chunk=chunk // 2,
                    model_size=model_size, out_size=out_size,
                    io_workers=io_workers, quant=quant,
                    quant_scales=quant_scales,
                )
            raise
    return results


def inpaint_with_gan(
    dem_path: str | Path,
    mask_path: str | Path,
    output_dir: str | Path,
    checkpoint_path: str | Path,
) -> Path:
    """Facade matching utils/gan_inpainting.py:5-19."""
    out = Path(output_dir) / f"{Path(dem_path).stem}_inpainted.png"
    return evaluate(dem_path, mask_path, checkpoint_path, out)
