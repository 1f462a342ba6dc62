"""Human-in-the-loop fine-tuning demo on synthetic terrain (TPU).

Simulates the reference's full research loop (SURVEY §3.3) end to end:

  1. initial GAN training on synthetic DSM tiles with structured
     (building/road-like) system masks;
  2. "human annotation": the flagged regions are exactly the inpainted
     holes — what an annotator would mark as detectable AI terrain;
  3. HumanGuidedTrainer fine-tune (generator only, HumanGuidedLoss =
     0.7*base + 0.3*human-region emphasis, reference
     human_guided_trainer.py:64-71, losses.py:152-204);
  4. reports hole-region PSNR on the annotated tiles and on held-out
     tiles, before vs after the fine-tune.

    python examples/hg_demo.py [--initial-steps 200] [--size 256]
        [--tiles 32] [--hg-epochs 10] [--out /tmp/hg_demo]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from synthetic_demo import fractal_terrain, structured_mask  # noqa: E402


def hole_psnr(pred: np.ndarray, target: np.ndarray, mask: np.ndarray):
    """PSNR restricted to hole pixels (mask == 0)."""
    hole = mask < 0.5
    if not hole.any():
        return float("nan")
    mse = float(np.mean((pred[hole] - target[hole]) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--initial-steps", type=int, default=200)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--tiles", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hg-epochs", type=int, default=10)
    p.add_argument("--out", default="/tmp/hg_demo")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from terra_gan_tpu.config import Config
    from terra_gan_tpu.data.dataset import DirectMatchDataset
    from terra_gan_tpu.losses import InpaintingLossConfig
    from terra_gan_tpu.models import Discriminator, PConvUNet
    from terra_gan_tpu.models.vgg import random_weights
    from terra_gan_tpu.training import (
        GANTrainState, HumanGuidedTrainer, adam, make_train_step,
    )
    from terra_gan_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    S = args.size

    # ---- data: train tiles + held-out tiles -----------------------------
    n_hold = max(4, args.tiles // 8)
    terr = np.stack(
        [fractal_terrain(rng, S) for _ in range(args.tiles + n_hold)]
    )[..., None]
    msks = np.stack(
        [structured_mask(rng, S) for _ in range(args.tiles + n_hold)]
    )[..., None]
    timg, tmsk = terr[: args.tiles], msks[: args.tiles]
    himg, hmsk = terr[args.tiles :], msks[args.tiles :]

    # ---- phase 1: initial GAN training ----------------------------------
    G = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
    D = Discriminator(compute_dtype=jnp.bfloat16)
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(args.seed),
        sample_shape=(args.batch, S, S, 1),
    )
    step = make_train_step(
        G, D, adam(2e-4), adam(2e-4), InpaintingLossConfig(),
        loss_compute_dtype=jnp.bfloat16,
    )
    vgg = random_weights(0)
    t0 = time.time()
    for i in range(args.initial_steps):
        sel = rng.integers(0, args.tiles, args.batch)
        batch = {
            "image": jnp.asarray(timg[sel]),
            "mask": jnp.asarray(tmsk[sel]),
        }
        state, metrics = step(state, batch, vgg)
        if i % 50 == 0:
            print(f"initial step {i}: g_loss={float(metrics['g_loss']):.4f}")
    t_initial = time.time() - t0

    fwd = jax.jit(lambda v, x, m: G.apply(v, x * m, m, False))
    variables = state.generator_variables()

    def eval_psnr(imgs, masks):
        outs = np.asarray(fwd(variables, jnp.asarray(imgs * masks),
                              jnp.asarray(masks)))
        return float(np.mean([
            hole_psnr(outs[i, ..., 0], imgs[i, ..., 0], masks[i, ..., 0])
            for i in range(imgs.shape[0])
        ]))

    before_train = eval_psnr(timg, tmsk)
    before_hold = eval_psnr(himg, hmsk)

    # ---- phase 2: simulated annotations + HG fine-tune ------------------
    # annotators flag the regions where AI terrain is detectable — here,
    # the inpainted holes themselves (white = flagged, as exported by
    # the portal; DirectMatchDataset binarizes at >0.5)
    pairs = []
    tile_dir = out_dir / "annotated"
    tile_dir.mkdir(exist_ok=True)
    for i in range(args.tiles):
        ip = tile_dir / f"ns{i:04d}.png"
        sp = tile_dir / f"ns{i:04d}_mask_resized.png"
        hp = tile_dir / f"ns{i:04d}_human.png"
        Image.fromarray((timg[i, ..., 0] * 255).astype(np.uint8)).save(ip)
        Image.fromarray((tmsk[i, ..., 0] * 255).astype(np.uint8)).save(sp)
        Image.fromarray(
            ((1.0 - tmsk[i, ..., 0]) * 255).astype(np.uint8)
        ).save(hp)
        pairs.append({
            "image_path": ip, "system_mask_path": sp,
            "human_mask_path": hp, "tile_name": f"ns{i:04d}",
        })
    ds = DirectMatchDataset(pairs, size=S)

    cfg = Config.from_dict({
        "training": {
            "loss_weights": {"perceptual": 0.1, "tv": 0.1, "boundary": 0.5},
            "modes": {
                "human_guided": {
                    "epochs": args.hg_epochs, "batch_size": args.batch,
                    "learning_rate": 1e-4,
                    "human_feedback_weight": 0.3, "base_loss_weight": 0.7,
                },
            },
        },
    })
    trainer = HumanGuidedTrainer(cfg)
    t0 = time.time()
    result = trainer.train(
        G, variables, ds, checkpoint_dir=out_dir / "hg", vgg_params=vgg
    )
    t_hg = time.time() - t0

    variables = result.get("variables", variables)
    after_train = eval_psnr(timg, tmsk)
    after_hold = eval_psnr(himg, hmsk)

    summary = {
        "initial_steps": args.initial_steps,
        "hg_epochs": args.hg_epochs,
        "size": S, "tiles": args.tiles,
        "initial_train_s": round(t_initial, 1),
        "hg_train_s": round(t_hg, 1),
        "hg_best_loss": result.get("best_loss"),
        "hole_psnr_annotated_before": round(before_train, 2),
        "hole_psnr_annotated_after": round(after_train, 2),
        "hole_psnr_heldout_before": round(before_hold, 2),
        "hole_psnr_heldout_after": round(after_hold, 2),
    }
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    improved = after_train > before_train
    print("HG-IMPROVED" if improved else "HG-NO-GAIN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
