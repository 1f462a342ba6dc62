"""Shared grayscale image loading.

One helper, two consumers (training datasets and the inference/grid
path): open a tile as a grayscale PIL image, decoding through the
native gray8 PNG decoder when the file is one of the pipeline's own
tiles (measured ~1.6x faster than PIL decode on this host class — on a
1-core host the training feed thread competes with nothing else, so
decode speed bounds real samples/s). Resizing stays in PIL so resample
semantics match the reference's transforms bit-for-bit
(mvp_gan/src/train.py:67-70, utils/dataset.py:14-43).
"""

from __future__ import annotations

from pathlib import Path

from PIL import Image


def open_gray(path: str | Path) -> Image.Image:
    """Grayscale PIL image; native gray8 PNG fast path, PIL fallback
    for everything else (other formats, bit depths, palettes)."""
    try:
        from .native import png_decode_gray8

        u8 = png_decode_gray8(Path(path).read_bytes())
        if u8 is not None:
            return Image.fromarray(u8, "L")
    except Exception:  # pragma: no cover - any surprise -> PIL
        pass
    return Image.open(path).convert("L")
