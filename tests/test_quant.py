"""w8a8 post-training quantization (ops/quant.py).

Gates the quantized eval path's numerics against the exact fp32 path:
the int8 conv may only perturb feature VALUES within the symmetric-
quantization error bound — the mask geometry (renorm ratios, validity
propagation) and the composite's valid pixels must be untouched, and
training calls through a quant-configured module must stay exactly
unquantized (the reference trains fp32: mvp_gan/src/train.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from terra_gan_tpu.models import PConvUNet
from terra_gan_tpu.ops.pconv import partial_conv2d, partial_conv2d_split
from terra_gan_tpu.ops.quant import (
    calibrate_quant_scales,
    partial_conv2d_q8,
    quantize_act,
    quantize_weight,
)


def _nrmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / (np.std(b) + 1e-12))


def test_quantize_weight_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32))
    w_q, s = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    # per-output-channel bound: |w - w_q*s| <= s/2 elementwise
    err = np.abs(np.asarray(w) - np.asarray(w_q, np.float32) * np.asarray(s))
    assert np.all(err <= np.asarray(s) / 2 + 1e-7)


def test_quantize_act_static_matches_dynamic_at_amax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 4)).astype(np.float32))
    xq_d, s_d = quantize_act(x)
    xq_s, s_s = quantize_act(x, float(np.max(np.abs(np.asarray(x)))) / 127.0)
    assert np.allclose(float(s_d), float(s_s), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(xq_d), np.asarray(xq_s))


@pytest.mark.parametrize(
    "k,s,p,cin,cout,hw",
    [
        (3, 1, 1, 8, 16, 32),
        (3, 2, 1, 8, 16, 32),
        (5, 2, 2, 16, 8, 33),
        (7, 2, 3, 1, 8, 32),  # enc1-like: exercises the s2d int8 path
    ],
)
def test_q8_matches_exact_within_quant_bound(k, s, p, cin, cout, hw):
    rng = np.random.default_rng(k * 10 + s)
    x = jnp.asarray(rng.random((2, hw, hw, cin), dtype=np.float32))
    m = jnp.asarray((rng.random((2, hw, hw, 1)) > 0.4).astype(np.float32))
    kern = jnp.asarray(
        rng.normal(0, 0.08, (k, k, cin, cout)).astype(np.float32)
    )
    bias = jnp.asarray(rng.normal(0, 0.01, (cout,)).astype(np.float32))

    ref, ref_mask = partial_conv2d(
        x, m, kern, bias, s, p, precision="highest"
    )
    out, out_mask = partial_conv2d_q8((x,), m, kern, bias, s, p)

    # mask path must be bit-identical (it is never quantized)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ref_mask))
    assert _nrmse(out, ref) < 2e-2


def test_q8_split_parts_match_concat():
    """The split path quantizes each part independently; the result must
    match quantizing the same parts against the concatenated exact
    reference within the quant bound."""
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.random((2, 16, 16, 8), dtype=np.float32))
    b = jnp.asarray(5.0 * rng.random((2, 16, 16, 4), dtype=np.float32))
    m = jnp.asarray((rng.random((2, 16, 16, 1)) > 0.3).astype(np.float32))
    kern = jnp.asarray(rng.normal(0, 0.1, (3, 3, 12, 16)).astype(np.float32))
    bias = jnp.zeros((16,), jnp.float32)

    ref, _ = partial_conv2d_split(
        (a, b), m, kern, bias, 1, 1, precision="highest"
    )
    out, _ = partial_conv2d_q8((a, b), m, kern, bias, 1, 1)
    assert _nrmse(out, ref) < 2e-2

    # per-part scales matter: part b's 5x range would dominate a shared
    # scale; verify part a's contribution is still resolved (not
    # quantized to a handful of levels) by checking against a
    # deliberately shared-scale quantization
    shared = float(np.max(np.abs(np.asarray(b)))) / 127.0
    coarse, _ = partial_conv2d_q8(
        (a, b), m, kern, bias, 1, 1, act_scales=(shared, shared)
    )
    assert _nrmse(out, ref) <= _nrmse(coarse, ref)


class TestQuantModel:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
        m = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.25).astype(np.float32))
        base = PConvUNet(base_width=16)
        variables = base.init(jax.random.PRNGKey(0), x, m, False)
        ref = base.apply(variables, x, m, False)
        return x, m, base, variables, ref

    def test_dynamic_quant_close_to_exact(self, setup):
        x, m, base, variables, ref = setup
        out = PConvUNet(base_width=16, quant="w8a8").apply(
            variables, x, m, False
        )
        assert _nrmse(out, ref) < 5e-3

    def test_valid_pixels_exact(self, setup):
        x, m, base, variables, ref = setup
        out = PConvUNet(base_width=16, quant="w8a8").apply(
            variables, x, m, False
        )
        keep = np.asarray(m, bool)
        np.testing.assert_array_equal(
            np.asarray(out)[keep], np.asarray(x)[keep]
        )

    def test_calibrated_static_scales(self, setup):
        x, m, base, variables, ref = setup
        scales = calibrate_quant_scales(base, variables, [(x, m)])
        stages = {f"enc{i}" for i in range(1, 8)} | {
            f"dec{i}" for i in range(1, 8)
        }
        # per-stage input-scale tuples plus ':out' producer scales
        # (consumed by the resident mode)
        assert set(scales) == stages | {f"{s}:out" for s in stages}
        # decoder stages consume (upsampled, skip) pairs -> 2 scales
        assert len(scales["dec7"]) == 2 and len(scales["enc1"]) == 1
        out = PConvUNet(
            base_width=16, quant="w8a8", quant_scales=scales
        ).apply(variables, x, m, False)
        assert _nrmse(out, ref) < 5e-3

    def test_unmasked_quant_bit_identical(self, setup, monkeypatch):
        # quantize(x)*m == quantize(x*m) exactly for m in {0,1}; the
        # unmasked form exists so XLA can fuse the quantize into the
        # producer's epilogue (exp_quant_fusion.py). Gate bit-identity.
        x, m, base, variables, ref = setup
        scales = calibrate_quant_scales(base, variables, [(x, m)])
        Q = PConvUNet(base_width=16, quant="w8a8", quant_scales=scales)
        monkeypatch.setenv("TERRA_GAN_TPU_QUANT_UNMASKED", "0")
        masked = Q.apply(variables, x, m, False)
        monkeypatch.setenv("TERRA_GAN_TPU_QUANT_UNMASKED", "1")
        unmasked = Q.apply(variables, x, m, False)
        np.testing.assert_array_equal(np.asarray(masked), np.asarray(unmasked))

    def test_resident_mode(self, setup):
        # int8-resident dataflow: producer-side quantize + integer-tap
        # upsample. Slightly more rounding than per-consumer quantize,
        # same quality class; valid pixels stay exact (composite).
        x, m, base, variables, ref = setup
        scales = calibrate_quant_scales(base, variables, [(x, m)])
        assert {f"enc{i}:out" for i in range(1, 8)} <= set(scales)
        assert {f"dec{i}:out" for i in range(1, 8)} <= set(scales)
        R = PConvUNet(
            base_width=16, quant="w8a8", quant_scales=scales,
            quant_resident=True,
        )
        out = R.apply(variables, x, m, False)
        assert _nrmse(out, ref) < 5e-3
        keep = np.asarray(m, bool)
        np.testing.assert_array_equal(
            np.asarray(out)[keep], np.asarray(x)[keep]
        )
        # train-mode calls through the resident model stay unquantized
        tr = R.apply(variables, x, m, True, mutable=["batch_stats"])[0]
        tr_ref = base.apply(variables, x, m, True, mutable=["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(tr), np.asarray(tr_ref))

    def test_int_upsample_matches_float_taps(self):
        # integer-tap bilinear == float bilinear of the dequantized
        # values, up to the requant rounding (<= 1 int8 step, ties)
        from terra_gan_tpu.ops.quant import int_upsample2x_s8
        from terra_gan_tpu.ops.resize import _upsample2x_linear_axis

        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 4)), jnp.int8)
        s_in, s_out = 0.013, 0.009
        got = np.asarray(int_upsample2x_s8(q, s_in, s_out), np.int32)
        up = _upsample2x_linear_axis(
            _upsample2x_linear_axis(
                jnp.asarray(q, jnp.float64) * s_in, 1
            ), 2
        )
        want = np.clip(np.round(np.asarray(up) / s_out), -127, 127)
        assert np.abs(got - want).max() <= 1

    def test_stage_allowlist_subset(self, setup):
        x, m, base, variables, ref = setup
        out = PConvUNet(
            base_width=16, quant="w8a8",
            quant_stages=frozenset({"enc2", "dec2"}),
        ).apply(variables, x, m, False)
        # quantizing fewer stages must not be worse than quantizing all
        out_all = PConvUNet(base_width=16, quant="w8a8").apply(
            variables, x, m, False
        )
        assert _nrmse(out, ref) <= _nrmse(out_all, ref) + 1e-6

    def test_train_mode_ignores_quant(self, setup):
        """Training through a quant-configured module is exactly the
        unquantized computation (PTQ is eval-only)."""
        x, m, base, variables, ref = setup
        q = PConvUNet(base_width=16, quant="w8a8")
        out_q, vars_q = q.apply(
            variables, x, m, True, mutable=["batch_stats"]
        )
        out_b, vars_b = base.apply(
            variables, x, m, True, mutable=["batch_stats"]
        )
        np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_b))
        ja, jb = jax.tree_util.tree_leaves(vars_q), jax.tree_util.tree_leaves(
            vars_b
        )
        for a, b in zip(ja, jb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_compute_dtype_composes(self, setup):
        x, m, base, variables, ref = setup
        out = PConvUNet(
            base_width=16, quant="w8a8", compute_dtype=jnp.bfloat16,
            precision=None,
        ).apply(variables, x, m, False)
        assert _nrmse(out, ref) < 1e-2

    def test_unknown_quant_mode_rejected(self, setup):
        x, m, base, variables, ref = setup
        with pytest.raises(ValueError, match="unknown quant mode"):
            PConvUNet(base_width=16, quant="int4").apply(
                variables, x, m, False
            )


class TestQuantPlumbing:
    """quant wiring through config, grid inference, and serving."""

    def test_config_key(self):
        from terra_gan_tpu.config import Config

        cfg = Config.from_dict({"evaluation": {"quant": "w8a8"}})
        assert cfg.evaluation.quant == "w8a8"
        cfg = Config.from_dict({"evaluation": {"quant": "w8a8_resident"}})
        assert cfg.evaluation.quant == "w8a8_resident"
        assert Config.from_dict({}).evaluation.quant is None
        with pytest.raises(ValueError, match="evaluation.quant"):
            Config.from_dict({"evaluation": {"quant": "int4"}})

    def test_quantized_clone_modes(self):
        from terra_gan_tpu.ops.quant import quantized_clone

        base = PConvUNet(base_width=16)
        scales = {"enc1": (0.01,)}
        q = quantized_clone(base, "w8a8", scales)
        assert q.quant == "w8a8" and not q.quant_resident
        r = quantized_clone(base, "w8a8_resident", scales)
        assert r.quant == "w8a8" and r.quant_resident and not r.quant_tail
        f = quantized_clone(base, "w8a8_resident_full", scales)
        assert f.quant == "w8a8" and f.quant_resident and f.quant_tail
        with pytest.raises(ValueError, match="unknown quant mode"):
            quantized_clone(base, "int4", scales)

    @pytest.mark.parametrize(
        "mode", ["w8a8", "w8a8_resident", "w8a8_resident_full"]
    )
    def test_inpaint_directory_quant(self, tmp_path, mode):
        from PIL import Image

        from terra_gan_tpu.evaluation.inference import inpaint_directory

        G = PConvUNet(base_width=16)
        x = jnp.zeros((1, 64, 64, 1))
        mm = jnp.ones((1, 64, 64, 1))
        v = jax.jit(G.init, static_argnums=3)(
            jax.random.PRNGKey(0), x, mm, False
        )
        rng = np.random.default_rng(0)
        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        for i in range(5):
            Image.fromarray(
                rng.integers(0, 255, (64, 64), dtype=np.uint8)
            ).save(tmp_path / "images" / f"ns{i:04d}.png")
            Image.fromarray(
                ((rng.random((64, 64)) > 0.3) * 255).astype(np.uint8)
            ).save(tmp_path / "masks" / f"ns{i:04d}_mask_resized.png")

        ref = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "ref", model_size=64, out_size=64,
        )
        out = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "q8", model_size=64, out_size=64, quant=mode,
        )
        assert [p.name for p in out] == [p.name for p in ref]
        # the full mode quantizes the final logit itself (the PTQ noise
        # the QAT tail exists to absorb — BASELINE.md final-conv study),
        # so its per-pixel bound vs bf16 is looser than the inner modes'
        tol = 8 if mode == "w8a8_resident_full" else 3
        for a, b in zip(out, ref):
            qa = np.asarray(Image.open(a), np.int16)
            qb = np.asarray(Image.open(b), np.int16)
            # int8 feature error through sigmoid + uint8 PNG quantization:
            # a few gray levels at most
            assert np.abs(qa - qb).max() <= tol

    def test_inpaint_directory_frozen_scales(self, tmp_path):
        """Deploying with pre-frozen QAT scales (quant_scales=) must
        bypass self-calibration and produce exactly the run that
        self-calibrates on the same tiles — the w8a8_resident_full
        deployment contract (QAT scale == serving scale)."""
        from PIL import Image

        from terra_gan_tpu.evaluation.inference import (
            _load_pair,
            inpaint_directory,
        )

        G = PConvUNet(base_width=16)
        v = jax.jit(G.init, static_argnums=3)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 1)), jnp.ones((1, 64, 64, 1)), False,
        )
        rng = np.random.default_rng(3)
        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 255, (64, 64), dtype=np.uint8)
            ).save(tmp_path / "images" / f"ns{i:04d}.png")
            Image.fromarray(
                ((rng.random((64, 64)) > 0.3) * 255).astype(np.uint8)
            ).save(tmp_path / "masks" / f"ns{i:04d}_mask_resized.png")

        # freeze scales on the SAME tiles self-calibration would see
        # (sorted pair order, first min(16, n)=4 tiles, image*mask)
        loaded = [
            _load_pair(
                tmp_path / "images" / f"ns{i:04d}.png",
                tmp_path / "masks" / f"ns{i:04d}_mask_resized.png",
                size=64,
            )
            for i in range(4)
        ]
        imgs = np.concatenate([x for x, _ in loaded])
        msks = np.concatenate([m for _, m in loaded])
        scales = calibrate_quant_scales(
            PConvUNet(base_width=16), v, [(imgs * msks, msks)]
        )

        auto = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "auto", model_size=64, out_size=64,
            quant="w8a8_resident_full",
        )
        frozen = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "frozen", model_size=64, out_size=64,
            quant="w8a8_resident_full", quant_scales=dict(scales),
        )
        assert [p.name for p in frozen] == [p.name for p in auto]
        for a, b in zip(frozen, auto):
            np.testing.assert_array_equal(
                np.asarray(Image.open(a)), np.asarray(Image.open(b))
            )

    def test_load_checkpoint_quant_scales(self, tmp_path):
        """QAT-tail checkpoints round-trip their frozen scales through
        the .pth master-checkpoint format (training/loop.py qat_tail ->
        evaluate-mode deployment)."""
        from terra_gan_tpu.evaluation.inference import (
            load_checkpoint_quant_scales,
        )
        from terra_gan_tpu.utils.torch_compat import save_pth

        scales = {"enc1": (0.01,), "dec1:out": 0.02}
        save_pth(tmp_path / "qat.pth", {"quant_scales": scales, "epoch": 3})
        got = load_checkpoint_quant_scales(tmp_path / "qat.pth")
        assert got is not None and got["dec1:out"] == pytest.approx(0.02)
        # checkpoints without scales (every pre-QAT checkpoint) -> None
        save_pth(tmp_path / "plain.pth", {"epoch": 3})
        assert load_checkpoint_quant_scales(tmp_path / "plain.pth") is None
        assert load_checkpoint_quant_scales(tmp_path / "missing.pth") is None

    def test_serving_lazy_calibration(self):
        from terra_gan_tpu.serving import InpaintService

        ref_svc = InpaintService(
            size=64, out_size=64, max_batch=2, bf16=False, base_width=8
        )
        q_svc = InpaintService(
            size=64, out_size=64, max_batch=2, bf16=False, base_width=8,
            quant="w8a8",
        )
        assert not q_svc._quant_done
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (1, 64, 64, 1), dtype=np.uint8)
        msk = (rng.random((1, 64, 64, 1)) > 0.3).astype(np.uint8)
        ref = ref_svc._infer(img, msk)
        out = q_svc._infer(img, msk)
        assert q_svc._quant_done
        assert q_svc.generator.quant == "w8a8"
        assert q_svc.generator.quant_scales  # calibrated, non-empty
        assert np.abs(out.astype(np.int16) - ref.astype(np.int16)).max() <= 3
        # second call reuses the calibrated fast path
        out2 = q_svc._infer(img, msk)
        np.testing.assert_array_equal(out, out2)

    @pytest.mark.parametrize(
        "mode", ["w8a8", "w8a8_resident", "w8a8_resident_full"]
    )
    def test_inpaint_directory_quant_mesh(self, tmp_path, mode):
        """The quantized grid path composes with mesh sharding — the
        production evaluate-mode case (evaluation.quant + --mesh).
        Sharding is data-parallel over independent tiles, so outputs
        must match the single-device quant run to <=1 uint8 level.
        Resident mode adds int8-resident tensors and grouped integer
        upsample convs under the sharded jit — the SPMD partitioner
        must handle both."""
        from PIL import Image

        from terra_gan_tpu.evaluation.inference import inpaint_directory
        from terra_gan_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        G = PConvUNet(base_width=16)
        v = jax.jit(G.init, static_argnums=3)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 1)), jnp.ones((1, 64, 64, 1)), False,
        )
        rng = np.random.default_rng(2)
        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        for i in range(10):  # non-divisible by 8: exercises pad+slice
            Image.fromarray(
                rng.integers(0, 255, (64, 64), dtype=np.uint8)
            ).save(tmp_path / "images" / f"ns{i:04d}.png")
            Image.fromarray(
                ((rng.random((64, 64)) > 0.3) * 255).astype(np.uint8)
            ).save(tmp_path / "masks" / f"ns{i:04d}_mask_resized.png")

        solo = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "solo", model_size=64, out_size=64, quant=mode,
        )
        sharded = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "mesh", model_size=64, out_size=64, quant=mode,
            mesh=make_mesh(8),
        )
        assert [p.name for p in sharded] == [p.name for p in solo]
        for a, b in zip(sharded, solo):
            qa = np.asarray(Image.open(a), np.int16)
            qb = np.asarray(Image.open(b), np.int16)
            assert np.abs(qa - qb).max() <= 1


class TestQatTail:
    """The int8 tail (w8a8_resident_full) and its QAT fine-tune path.

    BASELINE.md r3 measured the fully-resident tail at +4.4% throughput
    but -0.136 dB under PTQ; the straight-through fake-quant pieces
    here let training adapt to the deployed tail numerics
    (scripts/exp_qat_tail.py banks the win)."""

    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
        m = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.25).astype(np.float32))
        base = PConvUNet(base_width=16)
        variables = base.init(jax.random.PRNGKey(0), x, m, False)
        ref = base.apply(variables, x, m, False)
        scales = calibrate_quant_scales(base, variables, [(x, m)])
        return x, m, base, variables, ref, scales

    def test_fake_quant_act_forward_and_ste(self):
        from terra_gan_tpu.ops.quant import fake_quant_act

        x = jnp.asarray(np.random.default_rng(0).standard_normal(256),
                        jnp.float32)
        s = 0.021
        got = np.asarray(fake_quant_act(x, s), np.float64)
        want = np.clip(np.round(np.asarray(x, np.float64) / s), -127, 127) * s
        np.testing.assert_allclose(got, want, atol=1e-6)
        # STE: d/dx sum(fake_quant(x)) == 1 everywhere
        g = jax.grad(lambda v: jnp.sum(fake_quant_act(v, s)))(x)
        np.testing.assert_array_equal(np.asarray(g), 1.0)

    def test_fake_quant_weight_matches_deployed_scheme(self):
        from terra_gan_tpu.ops.quant import fake_quant_weight

        k = jnp.asarray(
            np.random.default_rng(1).standard_normal((3, 3, 8, 4)),
            jnp.float32,
        )
        got = np.asarray(fake_quant_weight(k), np.float64)
        # deployed inference scheme: quantize_weight then dequantize
        q, s = quantize_weight(k)
        want = np.asarray(q, np.float64) * np.asarray(s, np.float64)
        np.testing.assert_allclose(got, want, atol=1e-6)
        g = jax.grad(lambda v: jnp.sum(fake_quant_weight(v)))(k)
        np.testing.assert_array_equal(np.asarray(g), 1.0)

    def test_tail_mode_quality_and_valid_pixels(self, setup):
        x, m, base, variables, ref, scales = setup
        F = PConvUNet(base_width=16, quant="w8a8", quant_scales=scales,
                      quant_resident=True, quant_tail=True)
        out = F.apply(variables, x, m, False)
        # tail adds one more int8 rounding on the logit; same quality
        # class as resident mode on random init
        assert _nrmse(out, ref) < 1e-2
        keep = np.asarray(m, bool)
        np.testing.assert_array_equal(
            np.asarray(out)[keep], np.asarray(x)[keep]
        )
        # and it is genuinely a different tail than plain resident
        R = PConvUNet(base_width=16, quant="w8a8", quant_scales=scales,
                      quant_resident=True)
        r_out = R.apply(variables, x, m, False)
        assert np.abs(np.asarray(out) - np.asarray(r_out)).max() > 0

    def test_quantized_clone_full_mode(self, setup):
        from terra_gan_tpu.ops.quant import quantized_clone

        x, m, base, variables, ref, scales = setup
        f = quantized_clone(base, "w8a8_resident_full", scales)
        assert f.quant == "w8a8" and f.quant_resident and f.quant_tail

    def test_qat_train_forward_injects_tail_noise(self, setup):
        x, m, base, variables, ref, scales = setup
        Q = base.clone(qat_tail_scales={"dec1:out": scales["dec1:out"]})
        out_q, _ = Q.apply(variables, x, m, True, mutable=["batch_stats"])
        out_b, _ = base.apply(variables, x, m, True, mutable=["batch_stats"])
        # QAT train forward differs from plain train (the injected tail
        # quantization). At random init the bound is loose: the scale is
        # calibrated on EVAL forwards (running BN stats = init stats)
        # while train mode normalizes with batch stats, so the tail
        # clips — on trained weights the two distributions coincide and
        # the noise drops to the int8 rounding class
        # (scripts/exp_qat_tail.py measures it on trained weights).
        assert np.abs(np.asarray(out_q) - np.asarray(out_b)).max() > 0
        assert _nrmse(out_q, out_b) < 0.5
        # eval-mode calls ignore qat_tail_scales entirely
        ev = Q.apply(variables, x, m, False)
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(ref))

    def test_qat_gradients_flow_through_tail(self, setup):
        x, m, base, variables, ref, scales = setup
        Q = base.clone(qat_tail_scales={"dec1:out": scales["dec1:out"]})

        def loss(params):
            out, _ = Q.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, m, True, mutable=["batch_stats"],
            )
            return jnp.mean((out - x) ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # the STE must pass gradient through the fake-quantized tail:
        # both the final kernel and dec1's own kernel get signal
        assert np.abs(np.asarray(g["final_kernel"])).max() > 0
        assert np.abs(np.asarray(g["dec1"]["kernel"])).max() > 0
