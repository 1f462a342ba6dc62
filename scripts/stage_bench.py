"""Per-stage A/B of the fused Pallas PConv kernel vs the lax path.

Round 1 enabled the kernel all-or-nothing, which was a model-level
wash: deep stages win 16-25% but boundary stages (ow=64) lose. This
times each U-Net stage at its real eval shapes and prints a measured
allowlist for per-stage selection (models/generator.py stage_pallas).

Usage: python scripts/stage_bench.py [--batch 32] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# (name, H_in, cin, cout, k, stride) at 512^2 input; decoder stages
# take the post-concat cin (split conv in the model, concat here —
# the kernel concatenates anyway).
STAGES = [
    ("enc1", 512, 1, 64, 7, 2),
    ("enc2", 256, 64, 128, 5, 2),
    ("enc3", 128, 128, 256, 5, 2),
    ("enc4", 64, 256, 512, 3, 2),
    ("enc5", 32, 512, 512, 3, 2),
    ("enc6", 16, 512, 512, 3, 2),
    ("enc7", 8, 512, 512, 3, 2),
    ("dec7", 8, 1024, 512, 3, 1),
    ("dec6", 16, 1024, 512, 3, 1),
    ("dec5", 32, 1024, 512, 3, 1),
    ("dec4", 64, 768, 256, 3, 1),
    ("dec3", 128, 384, 128, 3, 1),
    ("dec2", 256, 192, 64, 3, 1),
    ("dec1", 512, 65, 64, 3, 1),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from terra_gan_tpu.ops.pallas.pconv_kernel import fused_pconv_eval
    from terra_gan_tpu.ops.pconv import partial_conv2d

    rng = np.random.default_rng(0)
    B = args.batch
    winners = []
    for name, h, cin, cout, k, stride in STAGES:
        x = jnp.asarray(
            rng.random((B, h, h, cin), dtype=np.float32)
        ).astype(jnp.bfloat16)
        m = jnp.asarray((rng.random((B, h, h, 1)) > 0.2).astype(np.float32))
        kern = jnp.asarray(
            rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32)
        ).astype(jnp.bfloat16)
        bias = jnp.asarray(rng.normal(0, 0.01, (cout,)).astype(np.float32))
        bn_s = jnp.asarray(rng.random(cout, dtype=np.float32) + 0.5)
        bn_b = jnp.asarray(rng.normal(0, 0.01, (cout,)).astype(np.float32))
        bn_m = jnp.asarray(rng.normal(0, 0.01, (cout,)).astype(np.float32))
        bn_v = jnp.asarray(rng.random(cout, dtype=np.float32) + 0.5)
        pad = k // 2

        def lax_path(x, m):
            out, nm = partial_conv2d(
                x, m, kern, bias, stride, pad, compute_dtype=jnp.bfloat16
            )
            a = bn_s / jnp.sqrt(bn_v + 1e-5)
            out = (out - bn_m) * a + bn_b
            return jnp.maximum(out, 0.0).astype(jnp.bfloat16), nm

        def pallas_path(x, m):
            return fused_pconv_eval(
                x, m, kern, bias, stride, pad,
                bn_scale=bn_s, bn_bias=bn_b, bn_mean=bn_m, bn_var=bn_v,
                relu=True,
            )

        row = {"name": name}
        for label, fn in (("lax", lax_path), ("pallas", pallas_path)):
            try:
                f = jax.jit(fn)
                o, nm = f(x, m)
                o.block_until_ready()
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    o, nm = f(x, m)
                o.block_until_ready()
                row[label] = (time.perf_counter() - t0) / args.iters * 1e3
            except ValueError as e:
                row[label] = None
                row.setdefault("err", str(e)[:60])
        lx, pa = row.get("lax"), row.get("pallas")
        if pa is None:
            print(f"{name}: lax {lx:7.2f} ms   pallas —  ({row.get('err','')})")
        else:
            tag = "PALLAS" if pa < lx else "lax"
            if pa < lx:
                winners.append(name)
            print(
                f"{name}: lax {lx:7.2f} ms   pallas {pa:7.2f} ms  -> {tag}"
                f"  ({(lx - pa):+.2f} ms)"
            )
    print("\nallowlist:", ",".join(winners))


if __name__ == "__main__":
    main()
