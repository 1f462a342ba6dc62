"""Attributed device profile of the fused G+D train step.

Traces N steps of the batch-16 bf16 512x512 full-loss training step
(the production single-chip configuration, BASELINE.md r2) and prints
the top device ops by accumulated time. Training MFU (~35%) trails the
eval forward's (~49%); this maps where the backward pass spends its
time so the gap can be attacked op-by-op, the way profile_infer.py
found the r1 upsample and concat-copy hotspots.

Usage: python scripts/profile_train.py [--batch 16] [--top 40]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from terra_gan_tpu.losses import InpaintingLossConfig
    from terra_gan_tpu.models import Discriminator, PConvUNet
    from terra_gan_tpu.models.vgg import random_weights
    from terra_gan_tpu.training import GANTrainState, adam, make_train_step
    from terra_gan_tpu.utils.profiling import device_op_summary, trace

    G = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
    D = Discriminator(compute_dtype=jnp.bfloat16)
    shape = (args.batch, args.size, args.size, 1)
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(0), sample_shape=shape
    )
    # donate=False: profiling re-feeds the same state object each call
    step = make_train_step(
        G, D, adam(2e-4), adam(2e-4), InpaintingLossConfig(),
        loss_compute_dtype=jnp.bfloat16, donate=False,
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.random(shape, dtype=np.float32)),
        "mask": jnp.asarray(
            (rng.random(shape) > 0.25).astype(np.float32)
        ),
    }
    vgg = random_weights(0)

    import time

    for _ in range(3):  # compile + steady state
        state, metrics = step(state, batch, vgg)
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, vgg)
    float(metrics["g_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"step: {dt * 1000:.1f} ms = {args.batch / dt:.1f} samples/s "
          f"(batch {args.batch}, {args.size}x{args.size})")

    logdir = "/tmp/tgt_profile_train"
    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir):
        for _ in range(args.iters):
            state, metrics = step(state, batch, vgg)
        float(metrics["g_loss"])

    rows = device_op_summary(logdir, top=args.top)
    total = sum(ms for _, ms in rows)
    print(f"\ntop {len(rows)} device ops ({total:.1f} ms accumulated "
          f"over {args.iters} steps):")
    for name, ms in rows:
        print(f"  {ms / args.iters:8.2f} ms/step  {name[:140]}")


if __name__ == "__main__":
    main()
