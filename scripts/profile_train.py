"""Attributed device profile + roofline table of the fused G+D train step.

Traces N steps of the batch-16 bf16 512x512 full-loss training step
(the production single-chip configuration, BASELINE.md r2/r3) and
prints two tables built from the TPU trace's per-op `model_flops` /
`bytes_accessed` / `tf_op` metadata (utils/profiling.device_op_table):

  1. component x direction buckets (generator/VGG/discriminator/loss/
     optimizer, forward vs backward) with achieved TFLOP/s and the
     roofline floor max(flops/peak, bytes/bw) per bucket;
  2. the top individual ops with the same floor verdicts — the
     train-side twin of the inference table in BASELINE.md.

This is round-4 verdict task #1: training ran at ~94 samples/s
(~17-19% of bf16 peak) while the eval forward runs at 49% bf16 MFU;
this maps where the backward pass actually spends its time.

Usage: python scripts/profile_train.py [--batch 16] [--top 30]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e single-chip peaks (BASELINE.md roofline constants)
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def classify(row) -> tuple[str, str]:
    """(component, direction) bucket for a device-op row."""
    src = row["source_stack"] or row["source"] or ""
    tf_op = row["tf_op"] or ""
    if "models/vgg.py" in src:
        comp = "vgg"
    elif "models/discriminator.py" in src:
        comp = "disc"
    elif (
        "models/generator.py" in src
        or "ops/pconv.py" in src
        or "ops/resize.py" in src
        or "models/layers.py" in src
    ):
        comp = "gen"
    elif "losses/inpainting.py" in src:
        comp = "loss"
    elif "optax" in src or "step.py" in src:
        comp = "opt/step"
    else:
        comp = "other"
    direction = "bwd" if "transpose(" in tf_op else "fwd"
    if comp in ("opt/step", "other"):
        direction = "-"
    return comp, direction


def floor_ms(flops: float, nbytes: float) -> tuple[float, str]:
    """Roofline floor for one step's flops/bytes, and which wall binds."""
    t_flop = flops / (PEAK_BF16_TFLOPS * 1e12) * 1e3
    t_mem = nbytes / (PEAK_HBM_GBS * 1e9) * 1e3
    return max(t_flop, t_mem), ("MACs" if t_flop >= t_mem else "bytes")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--parse-only", action="store_true",
                   help="re-analyze the existing /tmp/tgt_profile_train "
                        "trace without running the model")
    args = p.parse_args()

    if args.parse_only:
        report("/tmp/tgt_profile_train", args.iters, args.top)
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from terra_gan_tpu.losses import InpaintingLossConfig
    from terra_gan_tpu.models import Discriminator, PConvUNet
    from terra_gan_tpu.models.vgg import random_weights
    from terra_gan_tpu.training import GANTrainState, adam, make_train_step
    from terra_gan_tpu.utils.profiling import device_op_table, trace

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

    report(logdir, args.iters, args.top)


def report(logdir: str, n: int, top: int) -> None:
    from terra_gan_tpu.utils.profiling import device_op_table

    rows = device_op_table(logdir)
    total_ms = sum(r["ms"] for r in rows) / n
    total_fl = sum(r["flops"] for r in rows) / n
    total_by = sum(r["bytes"] for r in rows) / n
    print(f"\ndevice total: {total_ms:.1f} ms/step, "
          f"{total_fl / 1e9:.1f} GFLOP/step "
          f"({total_fl / 1e12 / (total_ms / 1e3):.1f} TFLOP/s achieved = "
          f"{total_fl / 1e12 / (total_ms / 1e3) / PEAK_BF16_TFLOPS:.1%} of "
          f"bf16 peak), {total_by / 1e9:.2f} GB/step "
          f"({total_by / 1e9 / (total_ms / 1e3):.0f} GB/s = "
          f"{total_by / 1e9 / (total_ms / 1e3) / PEAK_HBM_GBS:.1%} of HBM)")

    # ---- bucket table --------------------------------------------------
    buckets: dict = {}
    for r in rows:
        key = classify(r)
        b = buckets.setdefault(key, {"ms": 0.0, "flops": 0.0, "bytes": 0.0})
        b["ms"] += r["ms"] / n
        b["flops"] += r["flops"] / n
        b["bytes"] += r["bytes"] / n
    print("\ncomponent buckets (per step):")
    print(f"  {'bucket':<14} {'ms':>7} {'GFLOP':>7} {'GB':>6} "
          f"{'TFLOP/s':>8} {'floor ms':>9} {'bound':>6} {'x-floor':>8}")
    for key, b in sorted(buckets.items(), key=lambda kv: -kv[1]["ms"]):
        fl, bound = floor_ms(b["flops"], b["bytes"])
        tfs = b["flops"] / 1e12 / (b["ms"] / 1e3) if b["ms"] else 0.0
        print(f"  {key[0] + ' ' + key[1]:<14} {b['ms']:7.2f} "
              f"{b['flops'] / 1e9:7.1f} {b['bytes'] / 1e9:6.2f} "
              f"{tfs:8.1f} {fl:9.2f} {bound:>6} "
              f"{b['ms'] / max(fl, 1e-9):8.1f}")

    # ---- top ops -------------------------------------------------------
    print(f"\ntop {top} device ops (per step):")
    for r in rows[:top]:
        ms = r["ms"] / n
        fl, bound = floor_ms(r["flops"] / n, r["bytes"] / n)
        comp, d = classify(r)
        where = r["source"].split("/")[-1]
        tf_op = (r["tf_op"] or "").split("/")[-1][:36]
        print(f"  {ms:7.2f} ms  floor {fl:6.2f} ({bound:>5}) "
              f"x{ms / max(fl, 1e-9):5.1f}  {comp}-{d:<4} "
              f"{r['name'][:44]:<44} {where:<22} {tf_op}")


if __name__ == "__main__":
    main()
