"""Model-level A/B: bf16 eval forward vs w8a8 quantized (ops/quant.py).

Headline config from bench.py: full-width PConvUNet, 512x512, batch 128,
bf16 compute. Rows: bf16 baseline, w8a8 dynamic scales, w8a8 static
(calibrated) scales, and a no-enc1 allowlist (first-layer-sensitive PTQ
variant). Timing = bench.py methodology (varying jit, scalar-fetch
sync over 10 iterations).
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from terra_gan_tpu.models import PConvUNet
from terra_gan_tpu.ops.quant import calibrate_quant_scales

BATCH = 128
ITERS = 10

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((BATCH, 512, 512, 1), dtype=np.float32))
m = jnp.asarray((rng.random((BATCH, 512, 512, 1)) > 0.25).astype(np.float32))

base = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
variables = jax.jit(base.init, static_argnums=3)(
    jax.random.PRNGKey(0), x, m, False
)


def measure(name, model):
    @jax.jit
    def fwd(v, image, mask):
        out = model.apply(v, image * mask, mask, False)
        return out, jnp.sum(out)

    out0, tok = fwd(variables, x, m)
    float(tok)  # compile + warmup (scalar fetch = sync on this relay)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, tok = fwd(variables, x, m)
    float(tok)
    dt = time.perf_counter() - t0
    tps = BATCH * ITERS / dt
    print(f"{name:28s} {dt / ITERS * 1e3:7.1f} ms/batch {tps:7.1f} tiles/s",
          flush=True)
    return tps, out0


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    tps_b, out_ref = measure("bf16 baseline", base)

    qdyn = PConvUNet(compute_dtype=jnp.bfloat16, precision=None,
                     quant="w8a8")
    tps_d, out_d = measure("w8a8 dynamic", qdyn)

    calib_base = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
    scales = calibrate_quant_scales(
        calib_base, variables, [(x[:16] * m[:16], m[:16])]
    )
    qstat = PConvUNet(compute_dtype=jnp.bfloat16, precision=None,
                      quant="w8a8", quant_scales=scales)
    tps_s, out_s = measure("w8a8 static (calibrated)", qstat)

    no_enc1 = frozenset(
        {f"enc{i}" for i in range(2, 8)} | {f"dec{i}" for i in range(1, 8)}
    )
    qsub = PConvUNet(compute_dtype=jnp.bfloat16, precision=None,
                     quant="w8a8", quant_scales=scales,
                     quant_stages=no_enc1)
    tps_n, out_n = measure("w8a8 static, no enc1", qsub)

    ref = np.asarray(out_ref[:4], np.float64)

    def nrmse(o):
        a = np.asarray(o[:4], np.float64)
        return float(np.sqrt(np.mean((a - ref) ** 2)) / ref.std())

    print(f"speedup dyn {tps_d / tps_b:.3f}x static {tps_s / tps_b:.3f}x "
          f"no-enc1 {tps_n / tps_b:.3f}x", flush=True)
    print(f"NRMSE vs bf16: dyn {nrmse(out_d):.2e} static {nrmse(out_s):.2e} "
          f"no-enc1 {nrmse(out_n):.2e}", flush=True)
