"""Multi-worker feed proof at its design point (r4 verdict task #6).

The r4 BatchLoader runs N producer threads behind a reorder buffer;
the DP-8 design point needs ~800 samples/s of epoch-1 feed (8 chips x
~100 samples/s/chip) against ~117-125 pairs/s/core of PNG decode
(BASELINE.md host-ingest table), i.e. the architecture must scale the
decode rate with producer count. This host has ONE core, so the proof
has two legs:

  1. REAL-DECODE leg: epoch-1 pairs/s through the real
     InpaintingDataset at workers 1/2/4 (cache off). On one core this
     measures overlap only (PIL/zlib release the GIL but there is no
     second core to run on) — expected ~flat, recorded so the 1-core
     number is a measurement rather than a guess.
  2. SYNTHETIC-STALL leg: a dataset whose __getitem__ blocks in a
     GIL-released sleep for exactly the per-pair decode budget
     (default 8 ms ~= 125 pairs/s single-producer, the measured
     1-core decode rate). A producer thread blocked in decode-with-
     GIL-released is indistinguishable, from the loader's side, from
     one blocked in sleep — so scaling here isolates the loader
     architecture (claim counter, reorder buffer, consumer) from the
     host's core count. Near-linear pairs/s at 1/2/4/8 workers is the
     DP-8 claim.
  3. DATA-WAIT leg: same stall dataset consumed by a consumer that
     spends `--step-ms` per batch (the 172 ms batch-16 device step at
     93 samples/s): reports `data_wait_ms_per_batch` (the r3 metric,
     training/loop.py:487) at 1 vs 4 workers — the operational signal
     a starved pod operator actually sees.

Reference quirk beaten: the reference feeds via a single-threaded
torch DataLoader with num_workers=0 (mvp_gan/src/train.py:75-81).

Usage: python scripts/bench_feed_workers.py [--pair-ms 8.0]
           [--batch 16] [--tiles 96] [--step-ms 172]
Run solo: a concurrent job on a 1-core host skews everything.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _StallDataset:
    """GIL-released fixed-cost item: the loader-architecture isolate."""

    def __init__(self, n: int, pair_ms: float, size: int = 64):
        import numpy as np

        self.n = n
        self.pair_s = pair_ms / 1e3
        zero = np.zeros((size, size, 1), np.float32)
        self._item = {"image": zero, "mask": zero, "human_mask": zero,
                      "tile_name": "t"}

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int):
        time.sleep(self.pair_s)  # releases the GIL, like cv2/PIL/zlib
        return dict(self._item)


def _rate(loader, consume_s: float = 0.0):
    """(pairs_per_sec, mean data_wait_ms_per_batch)."""
    n, wait = 0, 0.0
    batches = 0
    t0 = time.perf_counter()
    it = iter(loader)
    while True:
        tw = time.perf_counter()
        try:
            b = next(it)
        except StopIteration:
            break
        wait += time.perf_counter() - tw
        n += b["image"].shape[0]
        batches += 1
        if consume_s:
            time.sleep(consume_s)
    dt = time.perf_counter() - t0
    return n / dt, (wait / batches * 1e3 if batches else 0.0)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", type=int, default=96)
    p.add_argument("--src-size", type=int, default=500)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pair-ms", type=float, default=8.0)
    p.add_argument("--step-ms", type=float, default=172.0)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from terra_gan_tpu.data.dataset import BatchLoader, InpaintingDataset

    out = {"host_cores": os.cpu_count()}

    # -- leg 1: real decode ------------------------------------------
    root = Path(tempfile.mkdtemp(prefix="bench_feedw_"))
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

    out["real_decode_pairs_per_sec"] = {}
    for w in (1, 2, 4):
        ds = InpaintingDataset(root / "images", root / "masks",
                               size=args.size, cache_bytes=0)
        loader = BatchLoader(ds, batch_size=args.batch, shuffle=False,
                             num_workers=w)
        r, _ = _rate(loader)
        out["real_decode_pairs_per_sec"][str(w)] = round(r, 1)
        print(f"real decode   workers={w}: {r:7.1f} pairs/s")
    import shutil

    shutil.rmtree(root, ignore_errors=True)

    # -- leg 2: loader-architecture scaling --------------------------
    out["stall_pairs_per_sec"] = {}
    out["pair_ms"] = args.pair_ms
    n = max(args.tiles, args.batch * 24)
    for w in (1, 2, 4, 8):
        ds = _StallDataset(n, args.pair_ms)
        loader = BatchLoader(ds, batch_size=args.batch, shuffle=False,
                             num_workers=w)
        r, _ = _rate(loader)
        out["stall_pairs_per_sec"][str(w)] = round(r, 1)
        ideal = 1e3 / args.pair_ms * w
        print(f"stall {args.pair_ms:.0f} ms  workers={w}: {r:7.1f} pairs/s"
              f"  ({r / ideal * 100:4.0f}% of {ideal:.0f} linear)")

    # -- leg 3: data_wait at the device-step cadence ------------------
    out["data_wait_ms_per_batch"] = {}
    out["step_ms"] = args.step_ms
    for w in (1, 4):
        ds = _StallDataset(n, args.pair_ms)
        loader = BatchLoader(ds, batch_size=args.batch, shuffle=False,
                             num_workers=w)
        _, wait = _rate(loader, consume_s=args.step_ms / 1e3)
        out["data_wait_ms_per_batch"][str(w)] = round(wait, 1)
        print(f"data wait     workers={w}: {wait:7.1f} ms/batch"
              f"  (step {args.step_ms:.0f} ms)")

    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
