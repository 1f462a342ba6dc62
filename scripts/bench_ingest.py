"""Ingestion throughput bench: zip -> DSM PNGs + detector masks + splits.

SURVEY §3.1 hot loop #1 is the reference's per-tile OpenCV mask
generation, which runs strictly sequentially (zip_handler.py:69). This
framework threads it (data/ingest.py) and backs the .asc parse with
native C++ (native/terra_io.cpp). This bench builds a synthetic
parent grid (10x10 = 100 child tiles, 500x500 DSM / RGB at --rgb-size)
and measures end-to-end ingest tiles/s, sequential (reference
behavior) vs threaded, so BASELINE.md can record the win.

Usage: python scripts/bench_ingest.py [--tiles 100] [--rgb-size 2000]
         [--workers 8] [--skip-sequential]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import zipfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_synthetic_zip(root: Path, n_tiles: int, rgb_size: int) -> Path:
    """10x10 OS grid of synthetic DSM .asc + RGB .jpg pairs, zipped."""
    import cv2

    rng = np.random.default_rng(0)
    src = root / "src"
    dsm_dir = src / "getmapping-dsm-2000_0001"
    rgb_dir = src / "getmapping_rgb_25cm_0001"
    dsm_dir.mkdir(parents=True)
    rgb_dir.mkdir(parents=True)

    side = int(np.ceil(np.sqrt(n_tiles)))
    count = 0
    for x in range(side):
        for y in range(side):
            if count >= n_tiles:
                break
            child = f"ns{x:02d}{y:02d}"
            # 500x500 native 2 m DSM with terrain-like low-frequency relief
            base = rng.uniform(0, 60, (25, 25)).astype(np.float32)
            dem = cv2.resize(base, (500, 500), interpolation=cv2.INTER_CUBIC)
            header = (
                "ncols 500\nnrows 500\nxllcorner 0\nyllcorner 0\n"
                "cellsize 2.0\nNODATA_value -9999\n"
            )
            body = "\n".join(
                " ".join(f"{v:.2f}" for v in row) for row in dem
            )
            (dsm_dir / f"{child}_DSM.asc").write_text(header + body + "\n")
            # aerial-like RGB: green field + grey road strokes
            img = np.full((rgb_size, rgb_size, 3), (40, 120, 60), np.uint8)
            noise = rng.integers(-20, 20, img.shape, dtype=np.int16)
            img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
            for _ in range(4):
                p0 = tuple(int(v) for v in rng.integers(0, rgb_size, 2))
                p1 = tuple(int(v) for v in rng.integers(0, rgb_size, 2))
                cv2.line(img, p0, p1, (128, 128, 128), rgb_size // 100)
            cv2.imwrite(str(rgb_dir / f"{child}_rgb.jpg"), img)
            count += 1

    zip_path = root / "NS00.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for p in src.rglob("*"):
            if p.is_file():
                zf.write(p, p.relative_to(src))
    shutil.rmtree(src)
    return zip_path


def run_ingest(zip_path: Path, work_root: Path, max_workers: int) -> float:
    from terra_gan_tpu.config import Config
    from terra_gan_tpu.data.ingest import ingest_zip
    from terra_gan_tpu.data.splitting import GeographicalSplitter

    cfg = Config.from_dict({})
    cfg.data.raw_dir = str(work_root / "raw")
    cfg.data.processed_dir = str(work_root / "processed")
    cfg.data.output_dir = str(work_root / "output")
    splitter = GeographicalSplitter("NS00", Path(cfg.data.processed_dir))
    t0 = time.perf_counter()
    ok = ingest_zip(zip_path, "NS00", cfg, splitter=splitter,
                    max_workers=max_workers)
    dt = time.perf_counter() - t0
    assert ok
    n = len(splitter.tiles)
    shutil.rmtree(work_root, ignore_errors=True)
    return n / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", type=int, default=100)
    p.add_argument("--rgb-size", type=int, default=2000)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--skip-sequential", action="store_true")
    args = p.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="bench_ingest_"))
    try:
        t0 = time.perf_counter()
        zip_path = build_synthetic_zip(tmp, args.tiles, args.rgb_size)
        print(f"built {args.tiles}-tile synthetic zip "
              f"({zip_path.stat().st_size / 1e6:.0f} MB) "
              f"in {time.perf_counter() - t0:.1f}s")

        seq = None
        if not args.skip_sequential:
            seq = run_ingest(zip_path, tmp / "run_seq", max_workers=1)
            print(f"sequential (reference behavior): {seq:.2f} tiles/s")
        par = run_ingest(zip_path, tmp / "run_par", max_workers=args.workers)
        print(json.dumps({
            "metric": "ingest_tiles_per_sec",
            "value": round(par, 2),
            "unit": "tiles/s",
            "workers": args.workers,
            "rgb_size": args.rgb_size,
            "tiles": args.tiles,
            "sequential_tiles_per_sec": round(seq, 2) if seq else None,
            "speedup_vs_sequential": round(par / seq, 2) if seq else None,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
