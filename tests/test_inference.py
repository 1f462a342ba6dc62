"""Directory-level batched inference (evaluation/inference.py).

Covers the grid-scale path the CLI evaluate mode drives: pair
discovery, batched forward, 500x500 output contract, device-side
uint8 quantization, and reference-style per-tile failure skipping
(main_pipeline.py:528-530).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from terra_gan_tpu.evaluation.inference import inpaint_directory  # noqa: E402
from terra_gan_tpu.models import PConvUNet  # noqa: E402


@pytest.fixture(scope="module")
def model():
    G = PConvUNet(base_width=16)
    x = jnp.zeros((1, 64, 64, 1))
    m = jnp.ones((1, 64, 64, 1))
    v = jax.jit(G.init, static_argnums=3)(jax.random.PRNGKey(0), x, m, False)
    return G, v


def _write_split(tmp_path, n=5, size=100):
    rng = np.random.default_rng(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (size, size), dtype=np.uint8)
        ).save(tmp_path / "images" / f"ns{i:04d}.png")
        Image.fromarray(
            ((rng.random((size, size)) > 0.3) * 255).astype(np.uint8)
        ).save(tmp_path / "masks" / f"ns{i:04d}_mask_resized.png")


class TestInpaintDirectory:
    def test_outputs_and_contract(self, tmp_path, model):
        G, v = model
        _write_split(tmp_path)
        outs = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "out", model_size=64, out_size=100,
        )
        assert [p.name for p in outs] == [
            f"ns{i:04d}_inpainted.png" for i in range(5)
        ]
        arr = np.asarray(Image.open(outs[0]))
        # reference output contract: uint8 PNG at out_size
        assert arr.shape == (100, 100) and arr.dtype == np.uint8

    def test_skips_corrupt_tile(self, tmp_path, model):
        G, v = model
        _write_split(tmp_path)
        (tmp_path / "images" / "ns0002.png").write_bytes(b"not a png")
        outs = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "out", model_size=64, out_size=100,
        )
        names = [p.name for p in outs]
        assert "ns0002_inpainted.png" not in names
        assert len(names) == 4

    def test_missing_mask_warns_and_skips(self, tmp_path, model):
        G, v = model
        _write_split(tmp_path)
        (tmp_path / "masks" / "ns0001_mask_resized.png").unlink()
        outs = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "out", model_size=64, out_size=100,
        )
        assert len(outs) == 4
