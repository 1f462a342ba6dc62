"""AOT StableHLO export artifacts (serving/export.py).

The reference has no deployment artifact at all — its serving unit is
the torch repo itself (evaluate.py:30). These tests pin the rebuild's
export contract: hermetic bytes, symbolic batch, baked quantization,
and the serving-server integration."""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from terra_gan_tpu.models import PConvUNet
from terra_gan_tpu.ops.quant import calibrate_quant_scales
from terra_gan_tpu.serving import export as X

S = 64


@pytest.fixture(scope="module")
def small_model():
    G = PConvUNet(base_width=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, S, S, 1), dtype=np.float32))
    m = jnp.asarray((rng.random((2, S, S, 1)) > 0.3).astype(np.float32))
    variables = jax.jit(G.init, static_argnums=3)(
        jax.random.PRNGKey(0), x, m, False
    )
    return G, variables, x, m


class TestRoundtrip:
    def test_artifact_matches_model_across_batch_sizes(self, small_model):
        """One symbolic-batch artifact serves every batch size with the
        jitted model's numerics."""
        G, variables, x, m = small_model
        blob = X.serialize_generator(G, variables, size=S, platforms=("cpu",))
        call = X.load_exported(blob)
        ref_fn = jax.jit(lambda v, a, b: G.apply(v, a * b, b, False))
        for nb in (1, 2, 5):
            xi = jnp.tile(x[:1], (nb, 1, 1, 1))
            mi = jnp.tile(m[:1], (nb, 1, 1, 1))
            got = call(xi, mi)
            ref = ref_fn(variables, xi, mi)
            assert got.shape == (nb, S, S, 1)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=1e-6
            )

    def test_describe_without_loading(self, small_model, tmp_path):
        G, variables, *_ = small_model
        path = tmp_path / "g.shlo"
        meta = X.save_exported(
            path, G, variables, size=S, platforms=("tpu", "cpu")
        )
        assert meta == X.describe(path)
        assert meta["platforms"] == ["tpu", "cpu"]
        assert meta["in_avals"] == [f"float32[b,{S},{S},1]"] * 2
        assert meta["quant"] is None
        assert meta["calling_convention_version"] >= 9

    def test_cross_platform_artifact_runs_on_cpu(self, small_model):
        """tpu+cpu lowering from a CPU-only process still executes on
        the cpu leg (the TPU leg is carried for deployment)."""
        G, variables, x, m = small_model
        blob = X.serialize_generator(
            G, variables, size=S, platforms=("tpu", "cpu")
        )
        got = X.load_exported(blob)(x, m)
        ref = jax.jit(lambda v, a, b: G.apply(v, a * b, b, False))(
            variables, x, m
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_static_batch_mode(self, small_model):
        G, variables, x, m = small_model
        blob = X.serialize_generator(
            G, variables, size=S, platforms=("cpu",), static_batch=2
        )
        meta = X.describe(blob)
        assert meta["in_avals"] == [f"float32[2,{S},{S},1]"] * 2
        call = X.load_exported(blob)
        assert call(x, m).shape == (2, S, S, 1)
        with pytest.raises(Exception):  # wrong batch must be rejected
            call(jnp.tile(x, (2, 1, 1, 1)), jnp.tile(m, (2, 1, 1, 1)))

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="magic"):
            X.describe(b"not an artifact")


class TestQuantArtifact:
    def test_w8a8_baked(self, small_model):
        """A quantized export reproduces the calibrated w8a8 model —
        the int8 weights and static scales travel inside the bytes."""
        G, variables, x, m = small_model
        scales = calibrate_quant_scales(G, variables, [(x * m, m)])
        Gq = G.clone(quant="w8a8", quant_scales=scales)
        blob = X.serialize_generator(Gq, variables, size=S,
                                     platforms=("cpu",))
        assert X.describe(blob)["quant"] == "w8a8"
        got = X.load_exported(blob)(x, m)
        ref = jax.jit(lambda v, a, b: Gq.apply(v, a * b, b, False))(
            variables, x, m
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)
        # and it differs from the unquantized model (the bake is real)
        bf = jax.jit(lambda v, a, b: G.apply(v, a * b, b, False))(
            variables, x, m
        )
        assert float(np.abs(np.asarray(bf) - np.asarray(got)).max()) > 1e-6

    def test_w8a8_resident_baked(self, small_model):
        """The int8-resident dataflow (grouped integer upsample convs,
        producer-side quantize) lowers to a hermetic artifact too, and
        the metadata records the exact mode."""
        G, variables, x, m = small_model
        scales = calibrate_quant_scales(G, variables, [(x * m, m)])
        Gr = G.clone(quant="w8a8", quant_scales=scales,
                     quant_resident=True)
        blob = X.serialize_generator(Gr, variables, size=S,
                                     platforms=("cpu",))
        assert X.describe(blob)["quant"] == "w8a8_resident"
        got = X.load_exported(blob)(x, m)
        ref = jax.jit(lambda v, a, b: Gr.apply(v, a * b, b, False))(
            variables, x, m
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


class TestExportCLI:
    def test_script_end_to_end(self, tmp_path):
        """scripts/export_model.py produces a loadable artifact and
        prints its metadata."""
        out = tmp_path / "gen.shlo"
        script = Path(__file__).parent.parent / "scripts" / "export_model.py"
        proc = subprocess.run(
            [sys.executable, str(script), "--out", str(out),
             "--size", str(S), "--base-width", "8", "--fp32",
             "--platforms", "tpu,cpu", "--backend", "cpu"],
            capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        meta = json.loads(proc.stdout)
        assert meta["bytes"] == out.stat().st_size > 0
        call = X.load_exported(out)
        y = call(jnp.zeros((1, S, S, 1)), jnp.ones((1, S, S, 1)))
        assert y.shape == (1, S, S, 1)


class TestServingIntegration:
    def test_service_runs_artifact(self, small_model, tmp_path):
        """InpaintService --exported: same uint8 wire contract, model
        forward replaced by the artifact."""
        from terra_gan_tpu.serving import InpaintService

        G, variables, x, m = small_model
        path = tmp_path / "g.shlo"
        X.save_exported(path, G, variables, size=S, platforms=("cpu",))
        svc = InpaintService(
            exported=str(path), size=S, out_size=S, max_batch=4,
        )
        assert svc.generator is None and svc.exported_path == str(path)
        svc.warmup()
        imgs = (np.asarray(x) * 255).astype(np.uint8)
        masks = (np.asarray(m) > 0).astype(np.uint8)
        out = svc._infer(imgs, masks)
        # reference numerics: the artifact forward on the u8-decoded
        # inputs, uint8-quantized exactly like the checkpoint path
        xf = jnp.asarray(imgs.astype(np.float32) / 255.0)
        mf = jnp.asarray(masks.astype(np.float32))
        ref = jax.jit(lambda v, a, b: G.apply(v, a * b, b, False))(
            variables, xf, mf
        )
        ref_u8 = np.asarray(
            (jnp.clip(ref, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        )
        assert out.shape == ref_u8.shape
        # identical path modulo jit fusion: allow off-by-one from the
        # 255* rounding at a float boundary
        assert np.abs(out.astype(int) - ref_u8.astype(int)).max() <= 1

    def test_quant_flag_conflicts_with_exported(self, tmp_path):
        from terra_gan_tpu.serving import InpaintService

        with pytest.raises(ValueError, match="baked at export time"):
            InpaintService(exported=str(tmp_path / "x.shlo"), quant="w8a8")

    def test_static_batch_artifact_served(self, small_model, tmp_path):
        """A --static-batch artifact pins the server to its one bucket
        (review finding: warmup used to crash on bucket 1 with an
        opaque StableHLO shape-refinement error)."""
        from terra_gan_tpu.serving import InpaintService

        G, variables, x, m = small_model
        path = tmp_path / "g2.shlo"
        X.save_exported(path, G, variables, size=S, platforms=("cpu",),
                        static_batch=2)
        svc = InpaintService(
            exported=str(path), size=S, out_size=S, max_batch=16,
        )
        assert svc._buckets == [2]
        assert svc.batcher.max_batch == 2
        svc.warmup()
        imgs = (np.asarray(x) * 255).astype(np.uint8)
        masks = (np.asarray(m) > 0).astype(np.uint8)
        # a 1-item request pads up to the artifact's static batch
        out1 = svc._infer(imgs[:1], masks[:1])
        assert out1.shape == (1, S, S, 1)
        out2 = svc._infer(imgs, masks)
        assert out2.shape == (2, S, S, 1)
        np.testing.assert_array_equal(out1[0], out2[0])


class TestExportCalibration:
    def _write_pairs(self, d, flat=True, n=3):
        from PIL import Image

        rng = np.random.default_rng(7)
        img_dir = d if flat else d / "images"
        mask_dir = d if flat else d / "masks"
        img_dir.mkdir(parents=True, exist_ok=True)
        mask_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, (S, S), dtype=np.uint8)
            mask = (rng.random((S, S)) > 0.3).astype(np.uint8) * 255
            Image.fromarray(img).save(img_dir / f"t{i}.png")
            Image.fromarray(mask).save(
                mask_dir / f"t{i}_mask_resized.png"
            )

    @pytest.mark.parametrize("flat", [True, False])
    def test_quant_calibration_both_layouts(self, small_model, tmp_path,
                                            flat):
        """export --quant accepts the SAME calib-dir layouts as serving
        --calib-dir (review finding: it used to require {images,masks}
        and fabricated all-ones masks for unmasked tiles)."""
        G, variables, _, _ = small_model
        self._write_pairs(tmp_path, flat=flat)
        Gq = X.calibrated_quant_generator(
            G, variables, tmp_path, size=S
        )
        assert Gq.quant == "w8a8"
        assert Gq.quant_scales  # static scales came from the tiles

    def test_quant_calibration_empty_dir_raises(self, small_model,
                                                tmp_path):
        G, variables, _, _ = small_model
        with pytest.raises(ValueError, match="no masked calibration"):
            X.calibrated_quant_generator(G, variables, tmp_path, size=S)
