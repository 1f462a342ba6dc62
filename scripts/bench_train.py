"""Train-step throughput bench (512x512, full loss incl. VGG perceptual).

Measures samples/s for the fused GAN train step on the current device —
the number VERDICT round-1 asked to push >=100 samples/s at batch 16 on
one chip. Flags let us A/B the optimization levers.

Usage: python scripts/bench_train.py [--batch 16] [--iters 20]
         [--remat] [--fp32] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--remat", action="store_true",
                   help="per-stage remat (new default is off: batch-16 "
                        "512^2 full loss fits HBM without it)")
    p.add_argument("--vgg-remat", action="store_true")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--no-vgg", action="store_true")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of 3 steps")
    args = p.parse_args()

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from terra_gan_tpu.losses import InpaintingLossConfig
    from terra_gan_tpu.models import Discriminator, PConvUNet
    from terra_gan_tpu.models.vgg import random_weights
    from terra_gan_tpu.training import GANTrainState, adam, make_train_step

    cd = None if args.fp32 else jnp.bfloat16
    G = PConvUNet(compute_dtype=cd, precision=None if cd else "highest",
                  remat=args.remat)
    D = Discriminator(compute_dtype=cd)
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(0),
        sample_shape=(args.batch, args.size, args.size, 1),
    )
    loss_cfg = InpaintingLossConfig(
        perceptual_weight=0.0 if args.no_vgg else 0.1,
        vgg_remat=args.vgg_remat,
    )
    step = make_train_step(G, D, adam(2e-4), adam(2e-4), loss_cfg,
                           loss_compute_dtype=cd)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.random((args.batch, args.size, args.size, 1), dtype=np.float32)
        ),
        "mask": jnp.asarray(
            (rng.random((args.batch, args.size, args.size, 1)) > 0.25)
            .astype(np.float32)
        ),
    }
    vgg = None if args.no_vgg else random_weights(0)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, vgg)
    jax.block_until_ready(metrics)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"g_loss={float(metrics['g_loss']):.4f}")

    if args.profile:
        jax.profiler.start_trace(args.profile)
        for _ in range(3):
            state, metrics = step(state, batch, vgg)
        jax.block_until_ready(metrics)
        jax.profiler.stop_trace()
        print(f"trace written to {args.profile}")

    # timed region closed by a data-dependent scalar fetch (remote relay
    # can return from block_until_ready before execution completes)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, vgg)
    sync = float(metrics["g_loss"])
    dt = time.perf_counter() - t0
    ms = dt / args.iters * 1e3
    print(json.dumps({
        "metric": "train_samples_per_sec",
        "value": round(args.batch * args.iters / dt, 2),
        "unit": "samples/s/chip",
        "ms_per_step": round(ms, 1),
        "batch": args.batch,
        "size": args.size,
        "remat": args.remat,
        "dtype": "fp32" if args.fp32 else "bf16",
        "vgg": not args.no_vgg,
        "vgg_remat": args.vgg_remat,
        "final_g_loss": round(sync, 4),
    }))


if __name__ == "__main__":
    main()
