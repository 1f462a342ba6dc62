"""Pallas upsample kernel parity (interpret mode on CPU).

The forward must match ops/resize.py's stencil (itself torch
`F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)`
parity-tested, reference mvp_gan/src/models/generator.py:50-51); the
backward must match the hand-derived exact adjoint; and the pair must
be mutually adjoint. TPU-compile behavior (VMEM budget, timings) is
exercised on hardware by scripts/profile_train.py + bench.py and
recorded in BASELINE.md r5.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from terra_gan_tpu.ops.resize import (
    _upsample2x_adjoint,
    _upsample2x_linear_axis,
)
from terra_gan_tpu.ops.pallas.upsample_kernel import (
    supported,
    upsample2x_bwd_pallas,
    upsample2x_fwd_pallas,
)


def _ref_fwd(x):
    return _upsample2x_linear_axis(_upsample2x_linear_axis(x, 1), 2)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 16, 8),
        (1, 32, 16, 64),   # dec1-like channel count
        (2, 8, 8, 3),      # H == block size, odd channels
        (3, 16, 24, 5),    # non-square, non-power-of-two W
        (1, 40, 8, 4),     # H a non-power-of-two multiple of the block
    ],
)
def test_fwd_bwd_match_stencil(shape):
    rng = np.random.default_rng(sum(shape))
    assert supported(shape)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = upsample2x_fwd_pallas(x, interpret=True)
    want = _ref_fwd(x)
    np.testing.assert_allclose(got, want, atol=1e-5)

    n, h, w, c = shape
    g = jnp.asarray(rng.standard_normal((n, 2 * h, 2 * w, c)), jnp.float32)
    gotb = upsample2x_bwd_pallas(g, interpret=True)
    wantb = _upsample2x_adjoint(g)
    np.testing.assert_allclose(gotb, wantb, atol=1e-5)


def test_fwd_bwd_are_adjoint():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 32, 32, 4)), jnp.float32)
    lhs = float(jnp.vdot(upsample2x_fwd_pallas(x, interpret=True), g))
    rhs = float(jnp.vdot(x, upsample2x_bwd_pallas(g, interpret=True)))
    assert abs(lhs - rhs) < 1e-3 * max(1.0, abs(lhs))


def test_bf16_parity_vs_f32_stencil():
    """The kernel computes taps in fp32 internally, so its bf16 error
    is one output rounding — tighter than chained bf16 stencil ops."""
    rng = np.random.default_rng(1)
    x32 = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    got = upsample2x_fwd_pallas(
        jnp.asarray(x32, jnp.bfloat16), interpret=True
    ).astype(jnp.float32)
    want = _ref_fwd(jnp.asarray(x32))
    # bf16 input quantization (~2^-8 relative) + one output rounding
    np.testing.assert_allclose(got, want, atol=3e-2)
