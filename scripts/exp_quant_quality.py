"""Quality gate for the w8a8 eval mode: hole-PSNR on a TRAINED model.

Random-init NRMSE (tests/test_quant.py) bounds the numerics, but the
production question is whether quantization costs reconstruction
quality on a converged generator. This trains the full-width model on
synthetic terrain (examples/synthetic_demo.py data), then scores
hole-region PSNR on held-out tiles for bf16 vs w8a8 (dynamic and
calibrated-static scales).

    python scripts/exp_quant_quality.py [--steps 400] [--size 256]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))

from synthetic_demo import fractal_terrain, structured_mask  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--tiles", type=int, default=72)
    p.add_argument("--holdout", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from terra_gan_tpu.losses import InpaintingLossConfig
    from terra_gan_tpu.models import Discriminator, PConvUNet
    from terra_gan_tpu.ops.quant import calibrate_quant_scales
    from terra_gan_tpu.training import GANTrainState, adam, make_train_step
    from terra_gan_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(args.seed)
    tiles = np.stack(
        [fractal_terrain(rng, args.size) for _ in range(args.tiles)]
    )[..., None]
    masks = np.stack(
        [structured_mask(rng, args.size) for _ in range(args.tiles)]
    )[..., None]
    n_train = args.tiles - args.holdout

    G = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
    D = Discriminator(compute_dtype=jnp.bfloat16, precision=None)
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(args.seed),
        sample_shape=(1, args.size, args.size, 1),
        g_tx=adam(2e-4), d_tx=adam(2e-4),
    )
    step = make_train_step(
        G, D, adam(2e-4), adam(2e-4),
        InpaintingLossConfig(perceptual_weight=0.0, tv_weight=0.1,
                             boundary_weight=0.5),
        donate=False,
    )

    t0 = time.time()
    for it in range(args.steps):
        sel = rng.choice(n_train, size=args.batch, replace=False)
        batch = {"image": jnp.asarray(tiles[sel]),
                 "mask": jnp.asarray(masks[sel])}
        state, metrics = step(state, batch, None)
        if it % 100 == 0 or it == args.steps - 1:
            print(f"step {it:4d}: g_loss={float(metrics['g_loss']):.4f}",
                  flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s",
          flush=True)

    variables = state.generator_variables()
    hx = jnp.asarray(tiles[n_train:])
    hm = jnp.asarray(masks[n_train:])
    hole = np.asarray(hm)[..., 0] < 0.5
    target = tiles[n_train:][..., 0]

    def hole_psnr(model):
        fwd = jax.jit(lambda v, x, m: model.apply(v, x * m, m, False))
        pred = np.asarray(fwd(variables, hx, hm), np.float64)[..., 0]
        mse = ((pred - target) ** 2)[hole].mean()
        return round(float(10 * np.log10(1.0 / max(mse, 1e-12))), 3)

    rows = {"bf16": hole_psnr(G)}
    rows["w8a8_dynamic"] = hole_psnr(G.clone(quant="w8a8"))
    scales = calibrate_quant_scales(
        G, variables,
        [(jnp.asarray(tiles[:16] * masks[:16]), jnp.asarray(masks[:16]))],
    )
    rows["w8a8_static"] = hole_psnr(G.clone(quant="w8a8",
                                            quant_scales=scales))
    rows["w8a8_resident"] = hole_psnr(
        G.clone(quant="w8a8", quant_scales=scales, quant_resident=True)
    )
    no_enc1 = frozenset({f"enc{i}" for i in range(2, 8)}
                        | {f"dec{i}" for i in range(1, 8)})
    rows["w8a8_static_no_enc1"] = hole_psnr(
        G.clone(quant="w8a8", quant_scales=scales, quant_stages=no_enc1)
    )
    rows["delta_dynamic_db"] = round(rows["w8a8_dynamic"] - rows["bf16"], 3)
    rows["delta_static_db"] = round(rows["w8a8_static"] - rows["bf16"], 3)
    rows["delta_resident_db"] = round(rows["w8a8_resident"] - rows["bf16"], 3)
    print(json.dumps(rows, indent=2), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
