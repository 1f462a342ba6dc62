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


def test_upsample_custom_vjp_exact_adjoint():
    """The hand-written upsample backward (custom_vjp) must be the
    EXACT adjoint of the forward linear map — i.e. match autodiff of
    the pure stencil form (the same linear map torch's F.interpolate
    backward implements). The custom_vjp exists so the backward form
    is ours to optimize (r4 train profile: XLA's derived transpose of
    the depthwise dilated conv was the largest single-op gap). f32
    here (jax_enable_x64 is process-global); the f64 machine-precision
    check (errs ~1e-14) was run standalone and the f64 trajectory
    gates exercise the same adjoint inside the full train step."""
    from terra_gan_tpu.ops.resize import _upsample2x_linear_axis

    rng = np.random.default_rng(2)
    for shape in [(2, 8, 8, 3), (1, 16, 12, 5), (1, 1, 2, 3)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        g = jnp.asarray(rng.standard_normal(
            (shape[0], shape[1] * 2, shape[2] * 2, shape[3])
        ), jnp.float32)

        def stencil(v):
            return _upsample2x_linear_axis(
                _upsample2x_linear_axis(v, 1), 2
            )

        _, vjp_ref = jax.vjp(stencil, x)
        _, vjp_new = jax.vjp(upsample2x_bilinear, x)
        err = float(jnp.max(jnp.abs(vjp_new(g)[0] - vjp_ref(g)[0])))
        assert err < 1e-5, (shape, err)
        ferr = float(
            jnp.max(jnp.abs(upsample2x_bilinear(x) - stencil(x)))
        )
        assert ferr < 1e-6, (shape, ferr)


def test_upsample_vjp_under_jit_and_grad():
    """The custom_vjp composes with jit+grad on the bf16 perf path."""
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 16, 16, 4)),
        jnp.bfloat16,
    )

    @jax.jit
    def loss(v):
        return jnp.sum(upsample2x_bilinear(v) ** 2).astype(jnp.float32)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape and g.dtype == x.dtype
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
