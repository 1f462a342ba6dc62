"""Compiler-option sweep: scoped-VMEM limit vs eval/train throughput.

XLA's TPU backend reserves a scoped-VMEM budget per fusion; raising it
lets the scheduler keep larger operand tiles resident (fewer HBM round
trips per fused conv epilogue), at the risk of spills. Client-side
XLA_FLAGS cannot carry TPU flags on this relay toolchain (the CPU
plugin's parser aborts on them), but per-program
``jax.jit(..., compiler_options=...)`` reaches the remote compiler.

Usage: python scripts/exp_xla_flags.py [--what eval|train|both]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ("default", None),
    ("vmem64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("vmem128M", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
]


def bench_eval(opts) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from terra_gan_tpu.models import PConvUNet
    from terra_gan_tpu.ops.quant import calibrate_quant_scales

    G = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((128, 512, 512, 1), dtype=np.float32))
    m = jnp.asarray((rng.random((128, 512, 512, 1)) > 0.25).astype(np.float32))
    v = jax.jit(G.init, static_argnums=3)(jax.random.PRNGKey(0), x, m, False)
    scales = calibrate_quant_scales(G, v, [(x[:16] * m[:16], m[:16])])
    Q = G.clone(quant="w8a8", quant_scales=scales, quant_resident=True)

    def f(v, a, b):
        return jnp.sum(Q.apply(v, a * b, b, False))

    fwd = jax.jit(f, compiler_options=opts)
    float(fwd(v, x, m))
    t0 = time.perf_counter()
    for _ in range(10):
        tok = fwd(v, x, m)
    float(tok)
    return 128 * 10 / (time.perf_counter() - t0)


def bench_train(opts) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from terra_gan_tpu.losses import InpaintingLossConfig
    from terra_gan_tpu.models import Discriminator, PConvUNet
    from terra_gan_tpu.models.vgg import random_weights
    from terra_gan_tpu.training import GANTrainState, adam, make_train_step

    batch = 16
    G = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
    D = Discriminator(compute_dtype=jnp.bfloat16)
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(0), sample_shape=(batch, 512, 512, 1)
    )
    raw = make_train_step(
        G, D, adam(2e-4), adam(2e-4), InpaintingLossConfig(),
        loss_compute_dtype=jnp.bfloat16, jit_compile=False, donate=False,
    )
    step = jax.jit(raw, compiler_options=opts)
    rng = np.random.default_rng(0)
    data = {
        "image": jnp.asarray(rng.random((batch, 512, 512, 1), dtype=np.float32)),
        "mask": jnp.asarray(
            (rng.random((batch, 512, 512, 1)) > 0.25).astype(np.float32)
        ),
    }
    vgg = random_weights(0)
    for _ in range(3):
        state, metrics = step(state, data, vgg)
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for _ in range(15):
        state, metrics = step(state, data, vgg)
    float(metrics["g_loss"])
    return batch * 15 / (time.perf_counter() - t0)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=["eval", "train", "both"], default="both")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = {}
    for label, opts in CONFIGS:
        row = {}
        if args.what in ("eval", "both"):
            try:
                row["eval_tiles_per_sec"] = round(bench_eval(opts), 1)
            except Exception as e:
                row["eval_tiles_per_sec"] = f"failed: {str(e)[:80]}"
        if args.what in ("train", "both"):
            try:
                row["train_samples_per_sec"] = round(bench_train(opts), 1)
            except Exception as e:
                row["train_samples_per_sec"] = f"failed: {str(e)[:80]}"
        results[label] = row
        print(label, json.dumps(row), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
