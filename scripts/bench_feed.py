"""Training-feed benchmark: decode rate vs the decoded-tile cache.

Measures tiles/s through the real InpaintingDataset + BatchLoader for
each epoch, with the cache enabled and disabled — the numbers behind
BASELINE.md "Decoded-tile cache" and the `epoch.data_wait_ms_per_batch`
operational signal. Pure host benchmark (no device), run it solo: a
concurrent job on a 1-core host skews everything.

Usage: python scripts/bench_feed.py [--tiles 64] [--src-size 500]
           [--size 512] [--batch 16] [--epochs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", type=int, default=64)
    p.add_argument("--src-size", type=int, default=500)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from terra_gan_tpu.data.dataset import BatchLoader, InpaintingDataset

    root = Path(tempfile.mkdtemp(prefix="bench_feed_"))
    rng = np.random.default_rng(0)
    (root / "images").mkdir()
    (root / "masks").mkdir()
    for i in range(args.tiles):
        Image.fromarray(
            rng.integers(0, 255, (args.src_size, args.src_size),
                         dtype=np.uint8)
        ).save(root / "images" / f"t{i:03d}.png")
        Image.fromarray(
            ((rng.random((args.src_size, args.src_size)) > 0.3) * 255)
            .astype(np.uint8)
        ).save(root / "masks" / f"t{i:03d}.png")

    def epoch_rates(ds):
        rates = []
        for _ in range(args.epochs):
            loader = BatchLoader(ds, batch_size=args.batch, shuffle=False)
            t0 = time.perf_counter()
            n = sum(b["image"].shape[0] for b in loader)
            rates.append(n / (time.perf_counter() - t0))
        return rates

    for label, cache_bytes in (("cache off", 0), ("cache on", None)):
        ds = InpaintingDataset(
            root / "images", root / "masks", size=args.size,
            cache_bytes=cache_bytes,
        )
        rates = epoch_rates(ds)
        used = ds._cache.used / 2**20 if ds._cache else 0.0
        print(
            f"{label:9s}: " +
            "  ".join(f"epoch{e} {r:7.1f} t/s" for e, r in enumerate(rates))
            + (f"   ({used:.0f} MB cached)" if used else "")
        )

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
