"""A/B: quantize(x*m) vs quantize(x)*m on the w8a8 static eval path.

The two forms are bit-identical for {0,1} masks, but the second makes
the quantize a pure elementwise function of the producer stage's
output, which XLA can fuse into the producing epilogue (BN/ReLU chain
or the upsample conv) — turning a full bf16 read of every activation
tensor into an int8 one. Measures model-level throughput at the
headline shape and cross-checks outputs.

Usage: python scripts/exp_quant_fusion.py [--batch 128] [--iters 10]
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
    Q = G.clone(quant="w8a8", quant_scales=scales)

    def timed(flag: str):
        os.environ["TERRA_GAN_TPU_QUANT_UNMASKED"] = flag

        @jax.jit
        def fwd(v, a, b):
            out = Q.apply(v, a * b, b, False)
            return out, jnp.sum(out)

        out, token = fwd(variables, x, m)
        float(token)  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            _, token = fwd(variables, x, m)
        float(token)
        dt = time.perf_counter() - t0
        return args.batch * args.iters / dt, np.asarray(out[:2])

    base_tps, base_out = timed("0")
    print(f"masked-quant (current):   {base_tps:8.1f} tiles/s")
    new_tps, new_out = timed("1")
    print(f"quantize-then-mask:       {new_tps:8.1f} tiles/s "
          f"({new_tps / base_tps:.3f}x)")
    diff = float(np.max(np.abs(base_out.astype(np.float32)
                               - new_out.astype(np.float32))))
    print(f"max |out diff| (2 tiles): {diff:.3e}")


if __name__ == "__main__":
    main()
