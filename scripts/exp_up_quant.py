"""Probe: how should the decoder's upsample feed the int8 conv input?

The w8a8 profile (batch 128) shows the fused [bilinear-upsample ->
quantize] producer for dec1's part0 at 18.2 ms — ~4.7x its HBM floor
(read 1.07 GB bf16 + write 2.1 GB s8 ~= 3.9 ms at 819 GB/s). Candidates:

  a) fused: quantize composed directly on the upsample output (what
     XLA compiles today under TERRA_GAN_TPU_QUANT_UNMASKED=1);
  b) barrier: materialize the bf16 upsample result, then a separate
     quantize pass (optimization_barrier between);
  c) int-tap: keep the previous decoder output in int8 (scale s) and
     upsample with integer bilinear taps (x16 fixed point) in an
     integer conv, requantizing to the part scale in the epilogue.

Each variant is timed with a consuming sum so nothing is DCE'd.

Usage: python scripts/exp_up_quant.py [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from terra_gan_tpu.ops.resize import upsample2x_bilinear

    B = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((B, 256, 256, 64), dtype=np.float32), jnp.bfloat16
    )
    scale = 0.01

    def timed(fn, *a):
        f = jax.jit(fn)
        float(f(*a))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            tok = f(*a)
        float(tok)
        return (time.perf_counter() - t0) / args.iters * 1000

    def quant(v):
        q = jnp.clip(jnp.round(v.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8)

    def a_fused(x):
        q = quant(upsample2x_bilinear(x))
        return jnp.sum(q.astype(jnp.int32))

    def b_barrier(x):
        up = upsample2x_bilinear(x)
        (up,) = lax.optimization_barrier((up,))
        return jnp.sum(quant(up).astype(jnp.int32))

    print(f"a) fused up+quant:      {timed(a_fused, x):7.2f} ms")
    print(f"b) barrier up | quant:  {timed(b_barrier, x):7.2f} ms")

    # c) integer-tap upsample from an s8-resident input: taps
    # [1,3,3,1]/4 per axis -> 2D kernel outer([1,3,3,1])² / 16, values
    # <= 9 (int8-safe); accumulate int32, requant /16 in the epilogue.
    # Mirrors _upsample2x_bilinear_conv's pad/crop geometry exactly.
    x_q = quant(x)

    def c_int(xq):
        b, h, w_, c = xq.shape
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        taps = jnp.array([1, 3, 3, 1], jnp.int8)
        kern = (jnp.outer(taps, taps)[:, :, None, None]
                * jnp.ones((1, 1, 1, c), jnp.int8))
        y = lax.conv_general_dilated(
            xp, kern, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            preferred_element_type=jnp.int32,
        )[:, 2: 2 + 2 * h, 2: 2 + 2 * w_, :]
        # requant to the consumer scale (here: same scale -> /16)
        q = jnp.clip(jnp.round(y.astype(jnp.float32) / 16.0), -127, 127)
        return jnp.sum(q.astype(jnp.int8).astype(jnp.int32))

    try:
        print(f"c) int-tap s8->s8:      {timed(c_int, x_q):7.2f} ms")
    except Exception as e:
        print(f"c) int-tap failed: {str(e)[:140]}")


if __name__ == "__main__":
    main()
