"""bf16 performance-path numerics.

The perf mode (compute_dtype=bfloat16) swaps in faster lowerings — the
depthwise dilated-conv upsample, bf16 mask box-sums, compute-dtype conv
outputs. These must stay within the 1e-3 parity gate of the exact fp32
path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from terra_gan_tpu.models import PConvUNet
from terra_gan_tpu.ops.resize import (
    _upsample2x_bilinear_conv,
    upsample2x_bilinear,
)


def test_conv_upsample_matches_stencil_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 19, 23, 8), dtype=np.float32))
    ref = upsample2x_bilinear(x)  # fp32 -> exact stencil path
    got = _upsample2x_bilinear_conv(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )
    # borders included — torch edge clamping reproduced
    np.testing.assert_allclose(
        np.asarray(got[:, 0]), np.asarray(ref[:, 0]), rtol=2e-3, atol=2e-3
    )


def test_bf16_dispatch():
    x32 = jnp.zeros((1, 8, 8, 2), jnp.float32)
    xb = x32.astype(jnp.bfloat16)
    assert upsample2x_bilinear(x32).dtype == jnp.float32
    assert upsample2x_bilinear(xb).dtype == jnp.bfloat16
    assert upsample2x_bilinear(xb).shape == (1, 16, 16, 2)


def test_perf_mode_within_parity_gate():
    """bf16 model output vs exact fp32 model: NRMSE << 1e-3."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    m = jnp.asarray((rng.random((1, 64, 64, 1)) > 0.3).astype(np.float32))
    parity = PConvUNet(base_width=8)
    perf = PConvUNet(base_width=8, compute_dtype=jnp.bfloat16, precision=None)
    variables = parity.init(jax.random.PRNGKey(0), x, m, False)
    o_par = parity.apply(variables, x * m, m, False)
    o_perf = perf.apply(variables, x * m, m, False)
    d = np.asarray(o_perf - o_par)
    nrmse = np.sqrt((d ** 2).mean()) / max(np.abs(np.asarray(o_par)).max(), 1e-12)
    assert nrmse < 1e-3, nrmse
