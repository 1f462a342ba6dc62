"""Headline benchmark: 512x512 DSM inpainting throughput (tiles/sec).

The reference's inference path runs one 512x512 tile per forward on an
RTX 4070Ti (main_pipeline.py:513-525, evaluate.py:30). BASELINE.md
records no published numbers, so the measured torch-CPU-equivalent
isn't available here either; vs_baseline is computed against the
north-star proxy: the reference GPU's estimated per-tile latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Estimated reference throughput for vs_baseline: PConvUNet fwd at 512x512
# batch 1 on an RTX 4070Ti is ~30-40 ms/tile incl. host sync => ~30 tiles/s.
# (No published number exists — BASELINE.md; this anchor is recorded there.)
REFERENCE_TILES_PER_SEC = 30.0

# Measured legs under the anchor (round-2 verdict task #5):
# scripts/bench_ref_torch.py ran the ACTUAL reference torch PConvUNet on
# this host: 0.216 tiles/s (4.63 s/tile, CPU batch 1 fp32, 1 thread) —
# recorded in BASELINE.md next to the GPU estimate.
MEASURED_REF_CPU_TILES_PER_SEC = 0.216
# FLOP-counted forward cost of the 512^2 PConvUNet (r2 verdict audit:
# conv MACs x2 over all 14 stages + mask convs) and v5e bf16 peak.
GFLOP_PER_TILE = 93.9
V5E_PEAK_TFLOPS = 197.0


def main() -> None:
    import os
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from terra_gan_tpu.models import PConvUNet

    batch = 128  # measured sweet spot: 620 t/s @32 -> 1035 t/s @128.
    # bf16 OOMs at 160+; w8a8 fits up to 256 but 128 stays fastest
    # (BASELINE.md r2 batch sweep + r3 quant sweep). Grid-scale
    # inference (10x10-tile parents) makes ~100-tile batches the
    # production shape.
    shape = (batch, 512, 512, 1)
    generator = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    m = jnp.asarray((rng.random(shape) > 0.25).astype(np.float32))

    variables = jax.jit(generator.init, static_argnums=3)(
        jax.random.PRNGKey(0), x, m, False
    )

    def make_forward(model):
        @jax.jit
        def forward(variables, image, mask):
            # summed scalar as a sync token: block_until_ready on this
            # environment's remote relay can return before execution, so
            # we fetch a data-dependent scalar to close the timing region.
            out = model.apply(variables, image * mask, mask, False)
            return out, jnp.sum(out)

        return forward

    def timed(forward, iters=10):
        float(forward(variables, x, m)[1])  # warmup + compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out, token = forward(variables, x, m)
        float(token)
        return batch * iters / (time.perf_counter() - t0)

    # headline = the production serving mode: w8a8 static-calibrated
    # int8 MXU path (evaluation.quant / serving --quant). Measured
    # hole-PSNR delta vs bf16 on trained weights: -0.001 dB
    # (scripts/exp_quant_quality.py, BASELINE.md r3). Calibration (one
    # bf16 forward on 16 tiles) happens outside the timed region, as in
    # production where scales freeze after the first window.
    from terra_gan_tpu.ops.quant import calibrate_quant_scales

    bf16_tiles_per_sec = timed(make_forward(generator))
    scales = calibrate_quant_scales(
        generator, variables, [(x[:16] * m[:16], m[:16])]
    )
    candidates = {
        "bf16": bf16_tiles_per_sec,
        "w8a8_static": timed(
            make_forward(generator.clone(quant="w8a8", quant_scales=scales))
        ),
        # int8-resident inter-stage activations + integer-tap decoder
        # upsampling (r3: 1232 -> 1328 t/s; hole-PSNR delta +0.002 dB
        # on trained weights — scripts/exp_quant_{resident,quality}.py)
        "w8a8_resident": timed(
            make_forward(generator.clone(
                quant="w8a8", quant_scales=scales, quant_resident=True
            ))
        ),
        # resident mode through the tail: dec1's output int8 + final
        # conv on the int8 MXU. Quality contract: deploy on QAT-tail
        # fine-tuned checkpoints (training.qat_tail), measured -0.003 dB
        # vs bf16 after QAT vs -0.136 dB PTQ-only (scripts/
        # exp_qat_tail.py, BASELINE.md r5)
        "w8a8_resident_full": timed(
            make_forward(generator.clone(
                quant="w8a8", quant_scales=scales, quant_resident=True,
                quant_tail=True,
            ))
        ),
    }
    # on backends where int8 convs don't win (e.g. CPU smoke runs), the
    # headline falls back to the bf16 default eval mode
    mode = max(candidates, key=candidates.get)
    tiles_per_sec = candidates[mode]

    rec = {
        "metric": "inpaint_512_tiles_per_sec",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s/chip",
        "vs_baseline": round(tiles_per_sec / REFERENCE_TILES_PER_SEC, 2),
        "mode": mode,
        "bf16_tiles_per_sec": round(bf16_tiles_per_sec, 2),
        # model FLOPs utilization on the v5e bf16 peak — the measured
        # leg of the headline (93.9 GFLOP/tile, FLOP-counted r2). For
        # the w8a8 mode this is the bf16-EQUIVALENT utilization (useful
        # FLOPs delivered relative to the bf16 roofline; the int8 MXU
        # peak is ~2x higher, so int8-native MFU is about half this).
        "mfu": round(
            tiles_per_sec * GFLOP_PER_TILE / (V5E_PEAK_TFLOPS * 1e3), 4
        ) if jax.default_backend() == "tpu" else None,
        "vs_measured_ref_cpu": round(
            tiles_per_sec / MEASURED_REF_CPU_TILES_PER_SEC, 1
        ),
    }
    # secondary metrics must never take down the headline record
    try:
        rec["train_samples_per_sec"] = _train_throughput()
    except Exception as e:  # pragma: no cover - defensive
        rec["train_samples_per_sec"] = None
        rec["train_samples_per_sec_error"] = str(e)[:120]
    try:
        rate, diag = _grid_e2e(generator, variables)
        rec["grid_e2e_tiles_per_sec"] = rate
        # attribution record (r4 verdict task #4): the probe figures,
        # the policy's chosen window, and EVERY run's rate, so a
        # regression in the best-of number is attributable to relay
        # jitter vs a policy/code change from the artifact alone
        rec["grid_e2e_diag"] = diag
    except Exception as e:  # pragma: no cover - defensive
        rec["grid_e2e_tiles_per_sec"] = None
        rec["grid_e2e_tiles_per_sec_error"] = str(e)[:120]
    print(json.dumps(rec))


def _grid_e2e(generator, variables, n_tiles: int = 100):
    """Whole-parent-grid inference incl. host PNG decode/encode: the
    reference's evaluate-mode unit of work (10x10 child tiles,
    main_pipeline.py:497-539) measured end-to-end with the host IO
    overlapped against the device batches (parallel/infer.py).

    Returns (best_tiles_per_sec, diagnostics): the probe RTT/bandwidth
    the auto policy saw, its chosen window, and every run's rate —
    best-of alone proved unattributable when r4 regressed on relay
    jitter (BASELINE.md r5 grid-e2e note)."""
    import shutil
    import tempfile
    from pathlib import Path

    import cv2

    from terra_gan_tpu.evaluation.inference import inpaint_directory
    from terra_gan_tpu.parallel.infer import auto_chunk_policy, probe_fetch

    rtt, bw = probe_fetch()
    chunk, prefetch = auto_chunk_policy()
    diag = {
        "probe_rtt_ms": round(rtt * 1e3, 1),
        "probe_fetch_mb_s": round(bw / 1e6, 2),
        "chunk": chunk,
        "prefetch": prefetch,
        "runs": [],
    }

    root = Path(tempfile.mkdtemp(prefix="bench_grid_"))
    rng = np.random.default_rng(1)
    (root / "images").mkdir()
    (root / "masks").mkdir()
    for i in range(n_tiles):
        name = f"ns{i // 10:02d}{i % 10:02d}"
        cv2.imwrite(
            str(root / "images" / f"{name}.png"),
            rng.integers(0, 255, (500, 500), dtype=np.uint8),
        )
        cv2.imwrite(
            str(root / "masks" / f"{name}_mask_resized.png"),
            (rng.random((500, 500)) > 0.25).astype(np.uint8) * 255,
        )
    try:
        # warm the sharded-forward compile out of the timed region
        inpaint_directory(
            generator, variables, root / "images", root / "masks",
            root / "warm",
        )
        # best of 3: on this environment the device->host relay's
        # fetch rate jitters ~1.5x between runs (BASELINE.md), which
        # would dominate a single sample; every run is recorded in diag
        best = 0.0
        for i in range(3):
            t0 = time.perf_counter()
            outs = inpaint_directory(
                generator, variables, root / "images", root / "masks",
                root / f"out{i}",
            )
            dt = time.perf_counter() - t0
            assert len(outs) == n_tiles
            diag["runs"].append(round(n_tiles / dt, 2))
            best = max(best, n_tiles / dt)
        return round(best, 2), diag
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _train_throughput(batch: int = 16, iters: int = 20) -> float:
    """Secondary metric: fused G+D train-step samples/s at 512^2,
    full loss incl. VGG perceptual (VERDICT r1 item 3)."""
    import jax
    import jax.numpy as jnp

    from terra_gan_tpu.losses import InpaintingLossConfig
    from terra_gan_tpu.models import Discriminator, PConvUNet
    from terra_gan_tpu.models.vgg import random_weights
    from terra_gan_tpu.training import GANTrainState, adam, make_train_step

    G = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
    D = Discriminator(compute_dtype=jnp.bfloat16)
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(0), sample_shape=(batch, 512, 512, 1)
    )
    step = make_train_step(
        G, D, adam(2e-4), adam(2e-4), InpaintingLossConfig(),
        loss_compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    data = {
        "image": jnp.asarray(rng.random((batch, 512, 512, 1), dtype=np.float32)),
        "mask": jnp.asarray(
            (rng.random((batch, 512, 512, 1)) > 0.25).astype(np.float32)
        ),
    }
    vgg = random_weights(0)
    for _ in range(3):  # compile + steady-state warmup
        state, metrics = step(state, data, vgg)
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data, vgg)
    float(metrics["g_loss"])
    return round(batch * iters / (time.perf_counter() - t0), 2)


if __name__ == "__main__":
    main()
