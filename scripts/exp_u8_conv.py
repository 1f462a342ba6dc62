"""Probe: does XLA lower u8 x s8 -> s32 convs onto the v5e int8 MXU?

All PConv inputs are post-ReLU (non-negative), so unsigned activation
quantization with zero-point 0 gives one extra bit of resolution for
free — IF the mixed u8/s8 conv still hits the int8 MXU path. Times
s8xs8 vs u8xs8 on a shallow U-Net shape and checks exactness.

Usage: python scripts/exp_u8_conv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.default_rng(0)
    B, H, C = 128, 512, 64
    x_s8 = jnp.asarray(rng.integers(0, 127, (B, H, H, C)), jnp.int8)
    x_u8 = x_s8.astype(jnp.uint8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def timed(x, iters=10):
        f = jax.jit(lambda a: jnp.sum(conv(a, w)))
        ref = int(f(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            tok = f(x)
        int(tok)
        return (time.perf_counter() - t0) / iters * 1000, ref

    ms_s8, sum_s8 = timed(x_s8)
    print(f"s8 x s8 conv (512^2x{C}->{C} k3, b{B}): {ms_s8:7.2f} ms")
    try:
        ms_u8, sum_u8 = timed(x_u8)
        print(f"u8 x s8 conv (same):                  {ms_u8:7.2f} ms "
              f"({ms_s8 / ms_u8:.2f}x)  exact={sum_u8 == sum_s8}")
    except Exception as e:
        print(f"u8 x s8 conv failed: {str(e)[:140]}")


if __name__ == "__main__":
    main()
