"""Attributed device profile of the eval-mode generator forward.

Traces N steps of the batch-32 bf16 512x512 forward and prints the top
device ops by accumulated time — the map we use to aim kernel work.

Usage: python scripts/profile_infer.py [--batch 32] [--pallas] [--top 30]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--quant", action="store_true",
                   help="profile the w8a8 static-calibrated path")
    p.add_argument("--resident", action="store_true",
                   help="with --quant: the int8-resident dataflow")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from terra_gan_tpu.models import PConvUNet
    from terra_gan_tpu.utils.profiling import (
        device_op_summary, profile_fn, trace,
    )

    G = PConvUNet(compute_dtype=jnp.bfloat16, precision=None,
                  use_pallas=args.pallas)
    shape = (args.batch, args.size, args.size, 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    m = jnp.asarray((rng.random(shape) > 0.25).astype(np.float32))
    variables = jax.jit(G.init, static_argnums=3)(
        jax.random.PRNGKey(0), x, m, False
    )
    if args.quant:
        from terra_gan_tpu.ops.quant import calibrate_quant_scales

        scales = calibrate_quant_scales(
            G, variables, [(x[:16] * m[:16], m[:16])]
        )
        G = G.clone(quant="w8a8", quant_scales=scales,
                    quant_resident=args.resident)

    fwd = jax.jit(lambda v, a, b: G.apply(v, a * b, b, False))
    stats = profile_fn(fwd, variables, x, m, iters=args.iters)
    print(f"model: {stats['mean_ms']:.1f} ms/batch "
          f"= {args.batch / stats['mean_ms'] * 1000:.0f} tiles/s "
          f"(pallas={args.pallas})")

    logdir = "/tmp/tgt_profile"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir):
        out = None
        for _ in range(3):
            out = fwd(variables, x, m)
        float(jnp.sum(out))
    for name, ms in device_op_summary(logdir, top=args.top):
        print(f"{ms / 3:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
