"""Evaluation scaffolding + checkpoint-utils API parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from terra_gan_tpu.evaluation import (
    GANEvaluator,
    MetricsAggregator,
    ResultsManager,
    comparison_figure,
    sample_annotation_tiles,
)
from terra_gan_tpu.models import Discriminator, PConvUNet
from terra_gan_tpu.training import GANTrainState
from terra_gan_tpu.training.checkpoint_utils import (
    load_checkpoint,
    save_checkpoint,
    validate_checkpoint,
)


class FakeDataset:
    def __init__(self, n=3, size=64):
        rng = np.random.default_rng(0)
        self.items = []
        for i in range(n):
            img = rng.random((size, size, 1)).astype(np.float32)
            mask = (rng.random((size, size, 1)) > 0.3).astype(np.float32)
            self.items.append(
                {"image": img, "mask": mask, "tile_name": f"nj000{i}"}
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class TestScaffolding:
    def test_aggregator(self):
        agg = MetricsAggregator()
        agg.update({"a": 1.0, "b": 2.0})
        agg.update({"a": 3.0, "b": float("nan")})
        s = agg.summary()
        assert s["a"] == {"mean": 2.0, "min": 1.0, "max": 3.0}
        assert s["b"]["mean"] == 1.0  # nan skipped, count still 2

    def test_gan_evaluator(self):
        G = PConvUNet(base_width=8)
        x = jnp.zeros((1, 64, 64, 1))
        m = jnp.ones((1, 64, 64, 1))
        variables = G.init(jax.random.PRNGKey(0), x, m, False)
        ev = GANEvaluator(G, variables)
        results = ev.evaluate_dataset(FakeDataset())
        assert results["count"] == 3
        assert "psnr" in results["aggregate"]
        assert "nj0000" in results["per_tile"]

    def test_results_manager(self, tmp_path):
        rm = ResultsManager(tmp_path)
        rm.save("run1", {"x": 1.5})
        assert rm.load("run1") == {"x": 1.5}
        assert rm.list_results() == ["run1"]

    def test_comparison_figure(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.random((32, 32, 1))
        mask = (rng.random((32, 32, 1)) > 0.5).astype(float)
        out = comparison_figure(img, mask, img, save_path=tmp_path / "c.png")
        assert out.exists()

    def test_sampling_deterministic(self):
        tiles = [f"t{i}" for i in range(200)]
        a = sample_annotation_tiles(tiles, annotation_ratio=0.05, seed=1)
        b = sample_annotation_tiles(tiles, annotation_ratio=0.05, seed=1)
        assert a == b and len(a) == 10
        assert sample_annotation_tiles(tiles, 0.0001) != []  # minimum 1


torch = pytest.importorskip("torch")


class TestCheckpointUtils:
    def test_validate_and_roundtrip(self, tmp_path):
        G, D = PConvUNet(base_width=8), Discriminator(base_width=8)
        state = GANTrainState.create(
            G, D, jax.random.PRNGKey(0), sample_shape=(1, 64, 64, 1)
        )
        path = save_checkpoint(tmp_path / "ck.pth", state, epoch=3)
        obj = torch.load(path, map_location="cpu", weights_only=False)
        ok, kind = validate_checkpoint(obj)
        assert ok and kind == "full"
        restored, extra = load_checkpoint(path, state)
        assert extra["epoch"] == 3

        # legacy raw generator state dict
        from terra_gan_tpu.utils.torch_compat import (
            generator_vars_to_torch_state,
        )
        legacy = generator_vars_to_torch_state(
            {"params": state.g_params, "batch_stats": state.g_stats}
        )
        ok, kind = validate_checkpoint(legacy)
        assert ok and kind == "legacy"
        assert validate_checkpoint({"nonsense": 1}) == (False, "invalid")
