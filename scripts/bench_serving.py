"""Serving-path benchmark: latency + micro-batched throughput.

Starts the HTTP inpainting service (terra_gan_tpu/serving/server.py)
as a subprocess, then measures:
  * sequential single-tile latency (p50/p95) — the interactive case;
  * concurrent load (N clients) — where the micro-batcher coalesces
    requests into device batches (check /stats mean_batch).

Usage: python scripts/bench_serving.py [--port 8533] [--size 512]
           [--seq 20] [--conc 64] [--clients 8]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import subprocess
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def png_b64(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8533)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=20)
    p.add_argument("--conc", type=int, default=64)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument(
        "--quant", default=None, choices=["w8a8", "w8a8_resident"],
        help="spawn the server with --quant MODE (lazy first-batch "
        "calibration; the warmup request absorbs the rewarm)",
    )
    p.add_argument(
        "--attach", action="store_true",
        help="measure an already-running server on --port instead of "
        "spawning one (cold-cache warmup can exceed the health window "
        "when the relay compile path is slow)",
    )
    args = p.parse_args()

    proc = None
    if not args.attach:
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "terra_gan_tpu.serving.server",
                "--port", str(args.port), "--size", str(args.size),
                "--max-batch", str(args.max_batch),
            ] + (["--quant", args.quant] if args.quant else []),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    base = f"http://127.0.0.1:{args.port}"
    try:
        for _ in range(900):  # server warms all batch buckets first
            try:
                urllib.request.urlopen(base + "/healthz", timeout=2)
                break
            except Exception:
                time.sleep(1)
        else:
            raise RuntimeError("server never became healthy")

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (500, 500), dtype=np.uint8)
        msk = ((rng.random((500, 500)) > 0.25) * 255).astype(np.uint8)
        item = {"image": png_b64(img), "mask": png_b64(msk)}

        post(base + "/inpaint", item)  # client-path warmup
        lats = []
        for _ in range(args.seq):
            t0 = time.perf_counter()
            post(base + "/inpaint", item)
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        p50 = lats[len(lats) // 2]
        p95 = lats[int(len(lats) * 0.95) - 1]

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.clients) as pool:
            list(pool.map(
                lambda _: post(base + "/inpaint", item), range(args.conc)
            ))
        conc_dt = time.perf_counter() - t0
        stats = json.loads(
            urllib.request.urlopen(base + "/stats", timeout=30).read()
        )
        print(json.dumps({
            "metric": "serving_latency_ms",
            "p50": round(p50, 1), "p95": round(p95, 1),
            "concurrent_req_per_s": round(args.conc / conc_dt, 2),
            "mean_batch_under_load": round(stats.get("mean_batch", 0), 2),
            "size": args.size,
        }))
    finally:
        if proc is not None:
            proc.terminate()
            proc.wait(timeout=30)


if __name__ == "__main__":
    main()
