"""Sharded execution on the virtual 8-device CPU mesh.

Gates: (a) a DP-sharded train step runs and matches the single-device
step bit-for-bit in semantics (global-view BatchNorm/grad reductions),
(b) spatially-sharded inference matches unsharded, (c) batched
inference equals the per-tile loop the reference uses.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from terra_gan_tpu.losses import InpaintingLossConfig
from terra_gan_tpu.models import Discriminator, PConvUNet
from terra_gan_tpu.parallel import (
    BatchedInpainter,
    auto_spatial,
    make_mesh,
    pad_to_multiple,
    parse_mesh_arg,
    shard_batch,
    shard_train_step,
)
from terra_gan_tpu.training import GANTrainState, adam, make_train_step

LOSS_CFG = InpaintingLossConfig(perceptual_weight=0.0)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def models():
    return PConvUNet(base_width=8), Discriminator(base_width=8)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(3)
    img = rng.random((8, 128, 128, 1), dtype=np.float32)
    mask = (rng.random((8, 128, 128, 1)) > 0.3).astype(np.float32)
    return {"image": img, "mask": mask}


def make_state(models, key=0):
    G, D = models
    return GANTrainState.create(
        G, D, jax.random.PRNGKey(key), sample_shape=(2, 128, 128, 1)
    )


class TestShardedTrainStep:
    def test_matches_single_device(self, models, batch):
        G, D = models
        state1 = make_state(models)
        state2 = jax.tree.map(jnp.copy, state1)

        single = make_train_step(G, D, adam(), adam(), LOSS_CFG, donate=False)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        s1, m1 = single(state1, jb, None)

        mesh = make_mesh(8)
        raw = make_train_step(
            G, D, adam(), adam(), LOSS_CFG, jit_compile=False
        )
        sharded = shard_train_step(raw, mesh)
        sb = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        s2, m2 = sharded(state2, sb, None)

        # identical semantics: global-view BN + loss means
        for k in m1:
            np.testing.assert_allclose(
                float(m1[k]), float(m2[k]), rtol=2e-5, atol=1e-6
            )
        # Cross-device psum reassociates float sums; Adam's first step is
        # ~±lr*sign(grad), so near-zero grads can land up to 2*lr apart
        # (see test_train_step.py). Bound by that worst case.
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.g_params, s2.g_params
        )
        assert max(jax.tree.leaves(diff)) < 2.2 * 2e-4

    def test_data_spatial_mesh(self, models, batch):
        """2D (data=4, spatial=2) mesh: batch AND height sharded."""
        G, D = models
        state = make_state(models)
        mesh = make_mesh(8, spatial=2)
        raw = make_train_step(
            G, D, adam(), adam(), LOSS_CFG, jit_compile=False
        )
        sharded = shard_train_step(raw, mesh, shard_spatial=True)
        sb = shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items()}, mesh,
            shard_spatial=True,
        )
        s2, m2 = sharded(state, sb, None)
        assert np.isfinite(float(m2["g_loss"]))
        assert int(s2.step) == 1


class TestBatchedInference:
    def test_matches_per_tile_loop(self, models, batch):
        G, _ = models
        state = make_state(models)
        variables = state.generator_variables()
        mesh = make_mesh(8)
        inpainter = BatchedInpainter(G, variables, mesh=mesh, chunk=8)
        out = inpainter(batch["image"], batch["mask"])

        # reference-style loop: one tile at a time (evaluate.py:30)
        fwd = jax.jit(lambda v, x, m: G.apply(v, x * m, m, False))
        for i in range(batch["image"].shape[0]):
            want = np.asarray(
                fwd(
                    variables,
                    jnp.asarray(batch["image"][i : i + 1]),
                    jnp.asarray(batch["mask"][i : i + 1]),
                )
            )
            np.testing.assert_allclose(out[i : i + 1], want, rtol=2e-5, atol=2e-6)

    def test_spatial_sharded_matches(self, models, batch):
        """H-sharded inference (context-parallel analogue) == data-only."""
        G, _ = models
        state = make_state(models)
        variables = state.generator_variables()
        out_sp = BatchedInpainter(
            G, variables, mesh=make_mesh(8, spatial=2), chunk=8,
            shard_spatial=True,
        )(batch["image"], batch["mask"])
        out = BatchedInpainter(
            G, variables, mesh=make_mesh(8), chunk=8
        )(batch["image"], batch["mask"])
        np.testing.assert_allclose(out_sp, out, rtol=1e-4, atol=1e-4)

    def test_device_quantize_matches_host(self, models, batch):
        """quantize_uint8=True fetches uint8 bit-identical to the host
        save_tile conversion of the float output."""
        G, _ = models
        state = make_state(models)
        variables = state.generator_variables()
        mesh = make_mesh(8)
        outf = BatchedInpainter(G, variables, mesh=mesh, chunk=8)(
            batch["image"], batch["mask"]
        )
        outq = BatchedInpainter(
            G, variables, mesh=mesh, chunk=8, quantize_uint8=True
        )(batch["image"], batch["mask"])
        assert outq.dtype == np.uint8
        host = (np.clip(outf, 0.0, 1.0) * 255.0).astype(np.uint8)
        np.testing.assert_array_equal(outq, host)

    def test_ragged_tile_count(self, models, batch):
        """Tile counts that don't divide the mesh get padded + sliced back."""
        G, _ = models
        state = make_state(models)
        inpainter = BatchedInpainter(
            G, state.generator_variables(), mesh=make_mesh(8), chunk=8
        )
        out = inpainter(batch["image"][:5], batch["mask"][:5])
        assert out.shape == (5, 128, 128, 1)

    def test_pad_to_multiple(self):
        arrs = {"a": np.arange(10, dtype=np.float32).reshape(10, 1)}
        padded, pad = pad_to_multiple(arrs, 8)
        assert pad == 6 and padded["a"].shape == (16, 1)
        assert (padded["a"][10:] == padded["a"][9]).all()
        same, pad0 = pad_to_multiple(arrs, 5)
        assert pad0 == 0 and same["a"] is arrs["a"]


class TestAutoSpatial:
    """HBM-based spatial-axis heuristic (SURVEY §5.7 long-context analogue)."""

    def test_production_tiles_stay_unsharded(self):
        # 512² is the reference's production size — one chip holds it
        assert auto_spatial(8, 512, 512, batch_per_device=4) == 1
        assert auto_spatial(8, 512, 512, batch_per_device=2, training=True) == 1

    def test_oversized_tiles_engage_spatial(self):
        assert auto_spatial(8, 4096, 4096, batch_per_device=1) > 1
        assert auto_spatial(8, 2048, 2048, 1, training=True) > 1

    def test_spatial_divides_devices(self):
        for n in (1, 2, 4, 8):
            for hw in (512, 1024, 4096, 16384):
                s = auto_spatial(n, hw, hw, 1, training=True)
                assert n % s == 0 and s >= 1

    def test_monotone_in_size(self):
        sizes = [512, 1024, 2048, 4096, 8192]
        factors = [auto_spatial(8, s, s, 1, training=True) for s in sizes]
        assert factors == sorted(factors)

    def test_parse_mesh_arg(self):
        assert parse_mesh_arg(None) is None
        m = parse_mesh_arg("4x2")
        assert dict(m.shape) == {"data": 4, "spatial": 2}
        m = parse_mesh_arg("8")
        assert dict(m.shape) == {"data": 8, "spatial": 1}
        m = parse_mesh_arg("auto", 512, 512, 4)
        assert m.shape["data"] * m.shape["spatial"] == len(jax.devices())
        assert m.shape["spatial"] == 1  # 512² never engages spatial
        m = parse_mesh_arg("auto", 8192, 8192, 1, training=True)
        assert m.shape["spatial"] > 1


@pytest.mark.slow
class TestSpatialShardingAtScale:
    """Spatial sharding at a size where it matters (VERDICT r1 weak #7):
    1024² exercises all 7 encoder strides (1024 -> 8) with H split over
    the mesh, so XLA's auto halo exchange runs at every stage including
    the 7x7 enc1 stencil and the deepest stages where the per-device H
    slab (8/2 = 4 rows) is smaller than the halo."""

    def test_1024_spatial_matches_unsharded(self, models):
        G, _ = models
        state = make_state(models)
        variables = state.generator_variables()
        rng = np.random.default_rng(11)
        img = rng.random((2, 1024, 1024, 1), dtype=np.float32)
        # mask with structure crossing the shard boundary at H=512
        mask = np.ones((2, 1024, 1024, 1), np.float32)
        mask[:, 400:640, 300:900] = 0.0
        mask[:, 900:1000, 100:200] = 0.0

        out_sp = BatchedInpainter(
            G, variables, mesh=make_mesh(8, spatial=2), chunk=2,
            shard_spatial=True,
        )(img, mask)
        out = BatchedInpainter(
            G, variables, mesh=make_mesh(8), chunk=2
        )(img, mask)
        assert out_sp.shape == (2, 1024, 1024, 1)
        np.testing.assert_allclose(out_sp, out, rtol=1e-4, atol=1e-4)

    def test_1024_spatial4_matches(self, models):
        """4-way H split: per-device slabs hit the halo-dominated regime."""
        G, _ = models
        state = make_state(models)
        variables = state.generator_variables()
        rng = np.random.default_rng(12)
        img = rng.random((2, 1024, 1024, 1), dtype=np.float32)
        mask = (rng.random((2, 1024, 1024, 1)) > 0.25).astype(np.float32)
        out_sp = BatchedInpainter(
            G, variables, mesh=make_mesh(8, spatial=4), chunk=2,
            shard_spatial=True,
        )(img, mask)
        out = BatchedInpainter(
            G, variables, mesh=make_mesh(8), chunk=2
        )(img, mask)
        np.testing.assert_allclose(out_sp, out, rtol=1e-4, atol=1e-4)


class TestLocalMeshLike:
    """Per-host mesh rebuild for multi-host evaluate (review finding:
    the fallback used to drop the requested spatial factor whenever the
    global geometry exceeded the local device count — the common pod
    case — turning an HBM-driven spatial request into per-chip OOMs)."""

    def test_geometry_fits_local_devices(self):
        from terra_gan_tpu.parallel import local_mesh_like

        m = local_mesh_like(make_mesh(4, spatial=2), list(jax.devices()))
        assert dict(m.shape) == {"data": 2, "spatial": 2}

    def test_preserves_spatial_when_global_exceeds_local(self):
        from terra_gan_tpu.parallel import local_mesh_like

        global_mesh = make_mesh(8, spatial=2)  # pod-wide request
        local = list(jax.devices())[:4]        # this host's share
        m = local_mesh_like(global_mesh, local)
        assert dict(m.shape) == {"data": 2, "spatial": 2}

    def test_odd_local_count_rounds_down_to_spatial_multiple(self):
        from terra_gan_tpu.parallel import local_mesh_like

        global_mesh = make_mesh(8, spatial=2)
        m = local_mesh_like(global_mesh, list(jax.devices())[:5])
        assert dict(m.shape) == {"data": 2, "spatial": 2}

    def test_spatial_exceeding_local_falls_back_with_warning(self, caplog):
        from terra_gan_tpu.parallel import local_mesh_like

        global_mesh = make_mesh(8, spatial=8)
        with caplog.at_level("WARNING"):
            m = local_mesh_like(global_mesh, list(jax.devices())[:4])
        assert dict(m.shape) == {"data": 4, "spatial": 1}
        assert "spatial=1" in caplog.text
