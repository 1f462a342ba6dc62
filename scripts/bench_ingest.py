"""Host-ingest throughput benchmark: zip -> DSM PNGs + detector masks.

SURVEY §3.1 identifies the per-tile OpenCV mask generation loop as the
reference's CPU hot loop #1 — it runs strictly sequentially
(reference: utils/zip_handler.py:69). This repo threads it
(data/ingest.py) and parses .asc through the native C++ fast path
(native/terra_io.cpp). This script builds a synthetic 10x10-tile
parent grid at realistic sizes (DSM 500x500 .asc; RGB at --rgb px,
Digimap native is 4000) and measures end-to-end ingest tiles/s at
workers=1 (the reference's execution model) vs --workers.

Usage: python scripts/bench_ingest.py [--tiles 100] [--rgb 2000]
           [--workers 8] [--keep]
Prints one JSON line per run plus a summary comparison.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
import zipfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2

from terra_gan_tpu.config import Config
from terra_gan_tpu.data.asc import write_asc
from terra_gan_tpu.data.ingest import ingest_zip
from terra_gan_tpu.data.splitting import GeographicalSplitter


def build_zip(root: Path, n_side: int, rgb_px: int) -> Path:
    """Synthetic Digimap parent zip: n_side^2 tiles of DSM + RGB."""
    rng = np.random.default_rng(7)
    src = root / "src"
    dsm = src / "getmapping-dsm-2000_1234"
    rgb = src / "getmapping_rgb_25cm_1234"
    dsm.mkdir(parents=True)
    rgb.mkdir(parents=True)
    # structured aerial-like RGB so the detectors do real work: green
    # patches (vegetation), bright lines (roads), textured fields
    yy, xx = np.mgrid[0:rgb_px, 0:rgb_px]
    for x in range(n_side):
        for y in range(n_side):
            name = f"ns{x:02d}{y:02d}"
            elev = rng.uniform(0, 120, (500, 500))
            write_asc(dsm / f"{name}_DSM.asc", elev)
            img = rng.integers(60, 120, (rgb_px, rgb_px, 3), dtype=np.uint8)
            img[(yy // 97 + xx // 83) % 5 == 0] = (40, 140, 50)  # green
            img[np.abs(yy - xx) % 211 < 3] = (180, 180, 178)  # road-ish
            cv2.imwrite(str(rgb / f"{name}_rgb.jpg"), img)
    zip_path = root / "NS00.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for p in src.rglob("*"):
            if p.is_file():
                zf.write(p, p.relative_to(src))
    shutil.rmtree(src)
    return zip_path


def run_once(zip_path: Path, root: Path, tag: str, workers: int) -> dict:
    work = root / f"work_{tag}"
    cfg = Config.from_dict({
        "data": {
            "raw_dir": str(work / "raw"),
            "processed_dir": str(work / "processed"),
            "output_dir": str(work / "output"),
            "models_dir": str(work / "models"),
        },
        "mask_processing": {"visualization": {"enabled": False}},
    })
    splitter = GeographicalSplitter("NS00", Path(cfg.data.processed_dir))
    t0 = time.perf_counter()
    ok = ingest_zip(zip_path, "NS00", cfg, splitter=splitter,
                    max_workers=workers)
    dt = time.perf_counter() - t0
    n = len(splitter.tiles)
    rec = {
        "metric": f"ingest_tiles_per_sec_w{workers}",
        "value": round(n / dt, 2),
        "unit": "tiles/s",
        "tiles": n,
        "seconds": round(dt, 2),
        "ok": bool(ok),
    }
    print(json.dumps(rec))
    shutil.rmtree(work, ignore_errors=True)
    return rec


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", type=int, default=100)
    p.add_argument("--rgb", type=int, default=2000)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()
    n_side = int(round(args.tiles ** 0.5))

    root = Path(tempfile.mkdtemp(prefix="ingest_bench_"))
    try:
        t0 = time.perf_counter()
        zip_path = build_zip(root, n_side, args.rgb)
        print(f"# built {n_side * n_side}-tile zip "
              f"({zip_path.stat().st_size / 1e6:.0f} MB) "
              f"in {time.perf_counter() - t0:.1f}s")
        seq = run_once(zip_path, root, "seq", workers=1)
        par = run_once(zip_path, root, "par", workers=args.workers)
        speedup = par["value"] / max(seq["value"], 1e-9)
        print(f"# threaded ingest speedup: {speedup:.2f}x "
              f"({seq['value']} -> {par['value']} tiles/s, "
              f"rgb={args.rgb}px, workers={args.workers})")
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
