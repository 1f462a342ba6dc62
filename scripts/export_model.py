"""Export a trained generator to a serialized StableHLO inference artifact.

The artifact (terra_gan_tpu/serving/export.py) is hermetic — weights,
lowering platforms, and any w8a8 quantization are baked in — with a
symbolic batch dimension, so one file serves every batch size on every
platform it was lowered for, without this repo's model code.

Usage:
  python scripts/export_model.py --checkpoint models/master_model.pth \
      --out generator.shlo \
      [--quant w8a8 --calib-dir <dir with tile/mask pngs>] \
      [--platforms tpu,cpu] [--size 512] [--fp32] [--static-batch N]

Serve it:  python -m terra_gan_tpu.serving.server --exported generator.shlo
Load it:   terra_gan_tpu.serving.export.load_exported("generator.shlo")
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint", default=None,
                   help=".pth (reference layout or raw state dict) or "
                        "orbax checkpoint; omit for random weights "
                        "(smoke tests)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--base-width", type=int, default=64)
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--fp32", action="store_true",
                   help="fp32 compute (default bf16, the serving mode)")
    p.add_argument("--quant", choices=["w8a8"], default=None,
                   help="bake static-scale int8 quantization into the "
                        "artifact (needs --calib-dir)")
    p.add_argument("--calib-dir", default=None,
                   help="sample tile/mask pairs for --quant calibration")
    p.add_argument("--static-batch", type=int, default=None,
                   help="fix the batch dim instead of symbolic 'b'")
    p.add_argument("--backend", choices=["default", "cpu"],
                   default="default",
                   help="'cpu' pins the local backend — exporting only "
                        "lowers and serializes, so no accelerator is "
                        "needed even for --platforms tpu")
    args = p.parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from terra_gan_tpu.models import PConvUNet
    from terra_gan_tpu.serving import export as X
    from terra_gan_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    cd = None if args.fp32 else jnp.bfloat16
    generator = PConvUNet(
        base_width=args.base_width, compute_dtype=cd,
        precision="highest" if args.fp32 else None,
    )
    if args.checkpoint:
        variables = X.load_variables_for_export(args.checkpoint)
    else:
        print("WARNING: no --checkpoint; exporting random weights",
              file=sys.stderr)
        variables = jax.jit(generator.init, static_argnums=3)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.size, args.size, 1)),
            jnp.ones((1, args.size, args.size, 1)),
            False,
        )

    if args.quant:
        if not args.calib_dir:
            p.error("--quant needs --calib-dir (static activation "
                    "scales come from real tiles; see BASELINE.md r3 "
                    "— dynamic scales lose on both speed and quality)")
        generator = X.calibrated_quant_generator(
            generator, variables, args.calib_dir,
        )

    meta = X.save_exported(
        args.out, generator, variables,
        size=args.size,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s),
        static_batch=args.static_batch,
    )
    meta["bytes"] = Path(args.out).stat().st_size
    print(json.dumps(meta, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
