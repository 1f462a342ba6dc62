"""w8a8 batch sweep: does int8's smaller footprint unlock batch >128?

bf16 eval OOMs at batch 160-192 (BASELINE.md r2 sweep). With static
quant scales the bf16 x*m tensor is never materialized (the quantize
fuses into the input pass), so the per-stage peak drops ~1/3 — worth
re-probing the batch ceiling.
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

ITERS = 10

base = PConvUNet(compute_dtype=jnp.bfloat16, precision=None)
rng = np.random.default_rng(0)
x16 = jnp.asarray(rng.random((16, 512, 512, 1), dtype=np.float32))
m16 = jnp.asarray((rng.random((16, 512, 512, 1)) > 0.25).astype(np.float32))
variables = jax.jit(base.init, static_argnums=3)(
    jax.random.PRNGKey(0), x16, m16, False
)
scales = calibrate_quant_scales(base, variables, [(x16 * m16, m16)])
model = PConvUNet(compute_dtype=jnp.bfloat16, precision=None,
                  quant="w8a8", quant_scales=scales)

for batch in (128, 160, 192, 256):
    try:
        xb = jnp.asarray(rng.random((batch, 512, 512, 1), dtype=np.float32))
        mb = jnp.asarray(
            (rng.random((batch, 512, 512, 1)) > 0.25).astype(np.float32)
        )

        @jax.jit
        def fwd(v, image, mask):
            out = model.apply(v, image * mask, mask, False)
            return jnp.sum(out)

        float(fwd(variables, xb, mb))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            tok = fwd(variables, xb, mb)
        float(tok)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"batch {batch:4d}: {dt * 1e3:7.1f} ms  "
              f"{batch / dt:7.1f} tiles/s", flush=True)
        del xb, mb
    except Exception as e:
        print(f"batch {batch:4d}: FAILED {str(e)[:140]}", flush=True)
        break
