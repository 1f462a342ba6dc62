"""Fused Pallas PConv kernel parity (interpret mode on CPU).

The kernel's numerics are gated here against the lax reference path
for both strides and all reference kernel sizes; TPU-compile behavior
(envelope fallbacks, VMEM budget) is exercised on hardware by bench.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from terra_gan_tpu.models import PConvUNet
from terra_gan_tpu.ops.pconv import partial_conv2d
from terra_gan_tpu.ops.pallas.pconv_kernel import fused_pconv_eval


@pytest.mark.parametrize(
    "k,s,p,cin,cout,hw",
    [
        (3, 1, 1, 8, 16, 32),
        (3, 2, 1, 8, 16, 32),
        (5, 2, 2, 16, 8, 33),   # odd spatial size
        (3, 1, 1, 16, 24, 17),  # non-power-of-two channels/size
    ],
)
def test_kernel_matches_lax(k, s, p, cin, cout, hw):
    rng = np.random.default_rng(k * 100 + s)
    x = jnp.asarray(rng.random((2, hw, hw, cin), dtype=np.float32))
    m = jnp.asarray((rng.random((2, hw, hw, 1)) > 0.4).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.random((cout,), dtype=np.float32) + 0.5)
    bias2 = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.random((cout,), dtype=np.float32) + 0.5)

    ref_out, ref_mask = partial_conv2d(x, m, w, b, s, p, precision="highest")
    inv = scale / jnp.sqrt(var + 1e-5)
    want = jnp.maximum((ref_out - mean) * inv + bias2, 0.0)

    got_out, got_mask = fused_pconv_eval(
        x, m, w, b, s, p,
        bn_scale=scale, bn_bias=bias2, bn_mean=mean, bn_var=var,
        relu=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(ref_mask))


def test_envelope_rejections():
    x = jnp.zeros((1, 16, 16, 4))  # cin < 8
    m = jnp.ones((1, 16, 16, 1))
    w = jnp.zeros((3, 3, 4, 8))
    b = jnp.zeros((8,))
    with pytest.raises(ValueError):
        fused_pconv_eval(x, m, w, b, 1, 1, interpret=True)
    # big stride-2 stage exceeds the block budget with no strips path
    big = jnp.zeros((1, 512, 512, 64))
    with pytest.raises(ValueError):
        fused_pconv_eval(
            big, jnp.ones((1, 512, 512, 1)), jnp.zeros((3, 3, 64, 8)),
            b, 2, 1, interpret=True,
        )


def test_big_stride1_uses_strips_path():
    """Large stride-1 stages route through host-side halo strips."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 128, 32, 16), dtype=np.float32))
    m = jnp.asarray((rng.random((1, 128, 32, 1)) > 0.4).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32) * 0.1)
    b = jnp.zeros((8,))
    # shrink the budget so the strips path triggers at this size
    from terra_gan_tpu.ops.pallas import pconv_kernel as pk

    orig = pk._BLOCK_BUDGET
    pk._BLOCK_BUDGET = 32 * 1024
    try:
        got, gm = fused_pconv_eval(x, m, w, b, 1, 1, relu=True, interpret=True)
    finally:
        pk._BLOCK_BUDGET = orig
    ref, rm = partial_conv2d(x, m, w, b, 1, 1, precision="highest")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.maximum(ref, 0)), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(gm), np.asarray(rm))


def test_model_with_pallas_flag_matches(monkeypatch):
    """PConvUNet(use_pallas=True) == baseline in interpret mode."""
    from terra_gan_tpu.ops.pallas import pconv_kernel

    # force interpret so the pallas path executes on the CPU backend
    orig = pconv_kernel.fused_pconv_eval

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pconv_kernel, "fused_pconv_eval", interp)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    m = jnp.asarray((rng.random((1, 64, 64, 1)) > 0.3).astype(np.float32))
    base = PConvUNet(base_width=16)
    pall = PConvUNet(base_width=16, use_pallas=True)
    variables = base.init(jax.random.PRNGKey(0), x, m, False)
    o1 = base.apply(variables, x * m, m, False)
    o2 = pall.apply(variables, x * m, m, False)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    assert err < 1e-4, err


class TestAutoStageSelection:
    """Measured per-stage allowlist wiring (r2: enc5/enc6, batch<=16)."""

    def test_default_allowlist_env_gate(self, monkeypatch):
        from terra_gan_tpu.ops.pallas.pconv_kernel import (
            MEASURED_STAGE_WINS, pallas_stage_allowlist,
        )

        # default: OFF (model-level A/B is a wash — BASELINE.md r2)
        monkeypatch.delenv("TERRA_GAN_TPU_PALLAS", raising=False)
        assert pallas_stage_allowlist() == frozenset()
        monkeypatch.setenv("TERRA_GAN_TPU_PALLAS", "0")
        assert pallas_stage_allowlist() == frozenset()
        # opt-in: the measured-win stages
        monkeypatch.setenv("TERRA_GAN_TPU_PALLAS", "auto")
        assert pallas_stage_allowlist() == MEASURED_STAGE_WINS

    def test_auto_mode_inert_on_cpu(self):
        """Default model (auto allowlist) == explicit-off model on the
        CPU backend: the TPU-measured auto path must never engage."""
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
        m = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.3).astype(np.float32))
        auto = PConvUNet(base_width=16)
        off = PConvUNet(base_width=16, pallas_stages=frozenset())
        variables = auto.init(jax.random.PRNGKey(0), x, m, False)
        o1 = auto.apply(variables, x * m, m, False)
        o2 = off.apply(variables, x * m, m, False)
        assert float(jnp.max(jnp.abs(o1 - o2))) == 0.0

    def test_auto_mode_engages_kernel(self, monkeypatch):
        """With the cpu guard and batch gate satisfied, allowlisted
        stages call the fused kernel (interpret-mode spy)."""
        import terra_gan_tpu.models.generator as gen_mod
        from terra_gan_tpu.ops.pallas import pconv_kernel

        calls = []
        orig = pconv_kernel.fused_pconv_eval

        def spy(*args, **kwargs):
            calls.append(args[0].shape)
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        monkeypatch.setattr(pconv_kernel, "fused_pconv_eval", spy)
        monkeypatch.setattr(gen_mod.jax, "default_backend", lambda: "tpu")

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
        m = jnp.asarray((rng.random((1, 64, 64, 1)) > 0.3).astype(np.float32))
        from terra_gan_tpu.ops.pallas.pconv_kernel import MEASURED_STAGE_WINS
        auto = PConvUNet(base_width=16, pallas_stages=MEASURED_STAGE_WINS)
        variables = auto.init(jax.random.PRNGKey(0), x, m, False)
        base = PConvUNet(base_width=16, pallas_stages=frozenset()).apply(
            variables, x * m, m, False
        )
        out = auto.apply(variables, x * m, m, False)
        assert calls, "allowlisted stages should hit the kernel"
        assert float(jnp.max(jnp.abs(out - base))) < 1e-4
