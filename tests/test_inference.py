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


class TestAutoChunkPolicy:
    """Startup fetch-probe chunk/pipeline policy (r4 verdict task #4).

    The best grid window size is a property of the host attachment
    (BASELINE.md r3 grid study): relay-attached devices pay ~0.5 s per
    fetch round trip -> large monolithic windows; PCIe/local -> small
    pipelined windows. auto_chunk_policy probes once and decides."""

    def test_probe_measures_and_caches(self):
        from terra_gan_tpu.parallel import infer as pinfer

        pinfer._FETCH_PROBE_CACHE.clear()
        rtt, bw = pinfer.probe_fetch()
        assert rtt >= 0.0 and bw > 0
        assert pinfer._FETCH_PROBE_CACHE  # cached
        # second call returns the cached tuple without re-measuring
        assert pinfer.probe_fetch() == (rtt, bw)

    def test_policy_flips_on_fetch_cost(self, monkeypatch):
        from terra_gan_tpu.parallel import infer as pinfer

        # CPU/PCIe-class: fetch is ~free -> small pipelined windows
        monkeypatch.setitem(
            pinfer._FETCH_PROBE_CACHE,
            (jax.devices()[0].platform, getattr(jax.devices()[0], "id", 0)),
            (1e-4, 2e9),
        )
        assert pinfer.auto_chunk_policy() == (32, 3)
        # relay-class: every fetch pays ~0.5 s -> monolithic windows
        monkeypatch.setitem(
            pinfer._FETCH_PROBE_CACHE,
            (jax.devices()[0].platform, getattr(jax.devices()[0], "id", 0)),
            (0.5, 8e6),
        )
        assert pinfer.auto_chunk_policy() == (128, 2)

    def test_cpu_backend_resolves_small_pipelined(self):
        # the CPU backend's device_get is a memcpy: the probe must land
        # far under the 50 ms relay threshold and pick the 32/3 policy
        from terra_gan_tpu.parallel import infer as pinfer

        pinfer._FETCH_PROBE_CACHE.clear()
        chunk, prefetch = pinfer.auto_chunk_policy()
        assert (chunk, prefetch) == (32, 3)

    def test_inpaint_directory_accepts_auto(self, tmp_path, model):
        G, v = model
        _write_split(tmp_path)
        ref = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "ref", model_size=64, out_size=100, chunk=16,
        )
        out = inpaint_directory(
            G, v, tmp_path / "images", tmp_path / "masks",
            tmp_path / "auto", model_size=64, out_size=100, chunk="auto",
        )
        assert [p.name for p in out] == [p.name for p in ref]
        for a, b in zip(out, ref):
            np.testing.assert_array_equal(
                np.asarray(Image.open(a)), np.asarray(Image.open(b))
            )
