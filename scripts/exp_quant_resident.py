"""A/B: w8a8 static vs w8a8 int8-RESIDENT at the 512^2 headline shape.

Resident mode (PConvUNet.quant_resident) keeps inter-stage activations
int8 in HBM: producer-side quantize fused into each stage's epilogue,
int8 skip/chain consumption, and exact integer-tap bilinear upsampling
between decoder stages (ops/quant.int_upsample2x_s8). Prints both
throughputs and the output NRMSE between the two modes.

Usage: python scripts/exp_quant_resident.py [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from terra_gan_tpu.models import PConvUNet
    from terra_gan_tpu.ops.quant import calibrate_quant_scales

    G = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
    shape = (args.batch, 512, 512, 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    m = jnp.asarray((rng.random(shape) > 0.25).astype(np.float32))
    variables = jax.jit(G.init, static_argnums=3)(
        jax.random.PRNGKey(0), x, m, False
    )
    scales = calibrate_quant_scales(G, variables, [(x[:16] * m[:16], m[:16])])

    def timed(model):
        @jax.jit
        def fwd(v, a, b):
            out = model.apply(v, a * b, b, False)
            return out, jnp.sum(out)

        out, token = fwd(variables, x, m)
        float(token)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            _, token = fwd(variables, x, m)
        float(token)
        dt = time.perf_counter() - t0
        return args.batch * args.iters / dt, np.asarray(out[:2], np.float32)

    q_tps, q_out = timed(G.clone(quant="w8a8", quant_scales=scales))
    print(f"w8a8 static:          {q_tps:8.1f} tiles/s")
    r_tps, r_out = timed(
        G.clone(quant="w8a8", quant_scales=scales, quant_resident=True)
    )
    print(f"w8a8 static resident: {r_tps:8.1f} tiles/s ({r_tps / q_tps:.3f}x)")
    nrmse = float(
        np.sqrt(np.mean((r_out - q_out) ** 2)) / np.sqrt(np.mean(q_out**2))
    )
    print(f"resident-vs-static NRMSE (2 tiles): {nrmse:.2e}")


if __name__ == "__main__":
    main()
