"""Selective-remat batch sweep on real TPU (round-2 verdict task #3).

r2 closed blanket remat (batch 32 OOM without it, 88.3 samples/s with
vgg-remat) but never measured SELECTIVE remat of only the full/half-
resolution stages — the activation-HBM hogs per BASELINE.md's own
analysis. This sweeps batch x remat-config and prints one JSON line
per cell:

  {"batch": B, "remat": "...", "vgg_remat": bool,
   "samples_per_sec": S | null, "error": "..."}

Run (TPU, background):
  python scripts/remat_sweep.py > /tmp/remat_sweep.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(batch: int, remat_stages, vgg_remat: bool,
            blanket: bool = False, iters: int = 15):
    import jax
    import jax.numpy as jnp

    from terra_gan_tpu.losses import InpaintingLossConfig
    from terra_gan_tpu.models import Discriminator, PConvUNet
    from terra_gan_tpu.models.vgg import random_weights
    from terra_gan_tpu.training import GANTrainState, adam, make_train_step

    G = PConvUNet(
        compute_dtype=jnp.bfloat16, precision=None,
        remat=blanket,
        remat_stages=frozenset(remat_stages) if remat_stages else None,
    )
    D = Discriminator(compute_dtype=jnp.bfloat16)
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(0), sample_shape=(batch, 512, 512, 1)
    )
    step = make_train_step(
        G, D, adam(2e-4), adam(2e-4),
        InpaintingLossConfig(vgg_remat=vgg_remat),
        loss_compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    data = {
        "image": jnp.asarray(
            rng.random((batch, 512, 512, 1), dtype=np.float32)
        ),
        "mask": jnp.asarray(
            (rng.random((batch, 512, 512, 1)) > 0.25).astype(np.float32)
        ),
    }
    vgg = random_weights(0)
    for _ in range(3):
        state, metrics = step(state, data, vgg)
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data, vgg)
    float(metrics["g_loss"])
    return round(batch * iters / (time.perf_counter() - t0), 2)


def main() -> None:
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    HIRES = ("enc1", "enc2", "dec2", "dec1")
    TOP = ("enc1", "dec1")
    cells = [
        # r2 reference points first (cheap; compile cached)
        dict(batch=16, remat_stages=None, vgg_remat=False),
        # selective remat at the reference's production batch 32
        dict(batch=32, remat_stages=TOP, vgg_remat=False),
        dict(batch=32, remat_stages=HIRES, vgg_remat=False),
        dict(batch=32, remat_stages=None, vgg_remat=True),  # r2 best @32
        dict(batch=32, remat_stages=TOP, vgg_remat=True),
        dict(batch=48, remat_stages=HIRES, vgg_remat=False),
        dict(batch=48, remat_stages=HIRES, vgg_remat=True),
        dict(batch=64, remat_stages=HIRES, vgg_remat=True),
        # selective remat also at batch 16: does freeing HBM help XLA
        # schedule, or is recompute pure loss at the fitting batch?
        dict(batch=16, remat_stages=TOP, vgg_remat=False),
    ]
    for cell in cells:
        rec = {
            "batch": cell["batch"],
            "remat": ",".join(cell["remat_stages"] or ()) or "none",
            "vgg_remat": cell["vgg_remat"],
        }
        try:
            rec["samples_per_sec"] = measure(
                cell["batch"], cell["remat_stages"], cell["vgg_remat"]
            )
        except Exception as e:
            rec["samples_per_sec"] = None
            rec["error"] = str(e)[:200]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
