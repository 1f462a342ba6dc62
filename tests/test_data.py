"""Data-plumbing tests: ASC parsing, splits, datasets, masks, paths.

Golden checks encode the reference quirks documented in SURVEY §2.2:
per-tile normalization, the %3 checkerboard closed form vs the
reference's full 10x10 table, inverted mask semantics (255=preserved),
uint8-then-resize ordering, and the zip->tiles flow end-to-end on a
synthetic Digimap zip.
"""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from terra_gan_tpu.config import Config
from terra_gan_tpu.data import (
    AnnotationValidator,
    BatchLoader,
    DirectMatchDataset,
    GeographicalSplitter,
    InpaintingDataset,
    PathManager,
    asc_to_png,
    checkerboard_split,
    ingest_zip,
    normalize_tile,
    parse_tile_xy,
    read_asc,
    write_asc,
)
from terra_gan_tpu.data.mask_processing import (
    MaskPipeline,
    MaskType,
    combine_masks,
    resize_mask_to_dem,
)
from terra_gan_tpu.data.visualization import DSMColorizer, build_lut

cv2 = pytest.importorskip("cv2")


# The reference's full active pattern table (data_splitting.py:184-196),
# restated to verify our closed form covers every reachable cell.
REF_PATTERN = [
    ["test", "val", "train"],
    ["val", "train", "test"],
    ["train", "test", "val"],
]


class TestASC:
    def test_roundtrip_and_nodata(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.uniform(10, 60, (50, 50))
        data[0, :5] = np.nan  # NODATA cells
        p = tmp_path / "t.asc"
        write_asc(p, data)
        grid, header = read_asc(p)
        assert header["NODATA_value"] == -9999.0
        assert np.isnan(grid[0, :5]).all()
        np.testing.assert_allclose(
            grid[~np.isnan(grid)], data[~np.isnan(data)], atol=1e-3
        )

    def test_normalize_per_tile(self):
        data = np.array([[0.0, 50.0], [100.0, np.nan]])
        norm = normalize_tile(data)
        assert norm.dtype == np.uint8
        assert norm[0, 0] == 0 and norm[1, 0] == 255
        assert norm[0, 1] == 127  # (50/100)*255 truncated
        assert norm[1, 1] == 0  # NaN -> 0

    def test_flat_tile_is_zero(self):
        assert (normalize_tile(np.full((4, 4), 7.0)) == 0).all()

    def test_all_nodata_returns_none(self, tmp_path):
        p = tmp_path / "bad.asc"
        write_asc(p, np.full((8, 8), np.nan))
        assert asc_to_png(p, tmp_path / "bad.png") is False
        assert not (tmp_path / "bad.png").exists()

    def test_png_is_512_resized(self, tmp_path):
        rng = np.random.default_rng(1)
        p = tmp_path / "t.asc"
        write_asc(p, rng.uniform(0, 100, (500, 500)))
        assert asc_to_png(p, tmp_path / "t.png")
        img = Image.open(tmp_path / "t.png")
        assert img.size == (512, 512) and img.mode == "L"


class TestSplitting:
    def test_closed_form_matches_reference_table(self):
        for py in range(3):
            for px in range(3):
                assert checkerboard_split(px, py, 0, 0) == REF_PATTERN[py][px]

    def test_thirds_and_no_adjacent(self):
        s = GeographicalSplitter("NJ05", Path("/tmp/unused"))
        for x in range(10):
            for y in range(10):
                s.tiles[(x, y)] = type("T", (), {
                    "path": Path(f"nj{x:02d}{y:02d}.png"), "x": x, "y": y,
                    "split": None,
                })()
        s.generate_splits()
        stats = s.get_split_statistics()
        # exact thirds on a 10x10 grid: 34/33/33 in some order
        assert sorted(stats.values()) == [33, 33, 34]
        for (x, y), split in s.assignments.items():
            for nx, ny in ((x + 1, y), (x, y + 1)):
                if (nx, ny) in s.assignments:
                    assert s.assignments[(nx, ny)] != split

    def test_ratio_validation_only(self):
        s = GeographicalSplitter("NJ05", Path("/tmp/unused"))
        with pytest.raises(ValueError):
            s.generate_splits({"train": 0.5, "val": 0.1, "test": 0.1})

    def test_metadata_roundtrip(self, tmp_path):
        s = GeographicalSplitter("NJ05", tmp_path)
        img = Image.fromarray(np.zeros((8, 8), np.uint8))
        for x in range(3):
            for y in range(3):
                p = tmp_path / f"nj{x:02d}{y:02d}.png"
                img.save(p)
                s.add_tile(p, x, y)
        s.generate_splits()
        s.apply_splits()
        s.save_metadata()

        meta = tmp_path / "NJ05" / "metadata"
        with open(meta / "split_mapping.json") as f:
            mapping = json.load(f)
        assert mapping["0,0"] == "test"  # closed-form anchor

        s2 = GeographicalSplitter("NJ05", tmp_path)
        s2.load_metadata()
        assert s2.assignments == s.assignments
        assert len(s2.tiles) == 9

        # images copied into split dirs
        n = sum(
            1 for split in ("train", "val", "test")
            for _ in (tmp_path / "NJ05" / split / "images").iterdir()
        )
        assert n == 9


class TestDatasets:
    def _make_pair_dirs(self, tmp_path, n=4, size=128):
        rng = np.random.default_rng(5)
        img_dir = tmp_path / "images"
        mask_dir = tmp_path / "masks"
        img_dir.mkdir(), mask_dir.mkdir()
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (size, size), dtype=np.uint8)
            ).save(img_dir / f"t{i}.png")
            Image.fromarray(
                (rng.random((size, size)) > 0.4).astype(np.uint8) * 255
            ).save(mask_dir / f"t{i}.png")
        return img_dir, mask_dir

    def test_inpainting_dataset(self, tmp_path):
        img_dir, mask_dir = self._make_pair_dirs(tmp_path)
        ds = InpaintingDataset(img_dir, mask_dir, size=64)
        assert len(ds) == 4
        item = ds[0]
        assert item["image"].shape == (64, 64, 1)
        assert item["image"].max() <= 1.0
        assert set(np.unique(item["mask"])) <= {0.0, 1.0}

    def test_count_mismatch_raises(self, tmp_path):
        img_dir, mask_dir = self._make_pair_dirs(tmp_path)
        (mask_dir / "t0.png").unlink()
        with pytest.raises(ValueError):
            InpaintingDataset(img_dir, mask_dir)

    def test_direct_match_error_item(self):
        ds = DirectMatchDataset(
            [{"image_path": "/nope.png", "system_mask_path": "/nope.png",
              "human_mask_path": "/nope.png", "tile_name": "x"}],
            size=32,
        )
        item = ds[0]
        assert item["tile_name"] == "error"
        assert item["image"].sum() == 0

    def test_batch_loader(self, tmp_path):
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=5)
        ds = InpaintingDataset(img_dir, mask_dir, size=32)
        loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=1)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["image"].shape == (2, 32, 32, 1)
        assert batches[-1]["image"].shape[0] == 1  # ragged tail kept
        loader2 = BatchLoader(ds, batch_size=2, drop_last=True)
        assert all(b["image"].shape[0] == 2 for b in loader2)

    def test_batch_loader_skips_corrupt_tile(self, tmp_path):
        """One corrupt PNG skips its batch, not the epoch (reference
        behavior: train.py:268-270 logs and continues per batch)."""
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=6)
        (img_dir / "t2.png").write_bytes(b"not a png at all")
        ds = InpaintingDataset(img_dir, mask_dir, size=32)
        loader = BatchLoader(ds, batch_size=2, shuffle=False)
        batches = list(loader)
        # 3 batches scheduled; the one containing t2 is skipped
        assert len(batches) == 2
        assert all(b["image"].shape == (2, 32, 32, 1) for b in batches)
        # a clean re-iteration still works (fresh producer thread)
        assert len(list(loader)) == 2

    def test_batch_loader_raises_when_all_batches_fail(self, tmp_path):
        """Systematic failure (every tile bad) must surface, not yield
        a silent empty epoch."""
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=4)
        for p in img_dir.glob("*.png"):
            p.write_bytes(b"broken")
        ds = InpaintingDataset(img_dir, mask_dir, size=32)
        loader = BatchLoader(ds, batch_size=2, shuffle=False)
        with pytest.raises(RuntimeError, match="every batch failed"):
            list(loader)

    def test_tile_cache_epoch2_identical_and_decode_free(self, tmp_path):
        """Epochs >= 2 serve cached post-resize uint8 tiles that are
        bit-identical to a fresh decode (the float conversion happens
        after the uint8 resize, so caching there is exact). Proven by
        deleting the files after epoch 1: epoch 2 must still produce
        the same arrays without touching disk."""
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=4)
        ds = InpaintingDataset(img_dir, mask_dir, size=64)
        fresh = [ds[i] for i in range(len(ds))]
        for f in list(img_dir.iterdir()) + list(mask_dir.iterdir()):
            f.unlink()
        for i, ref in enumerate(fresh):
            again = ds[i]
            np.testing.assert_array_equal(again["image"], ref["image"])
            np.testing.assert_array_equal(again["mask"], ref["mask"])

    def test_tile_cache_budget_zero_disables(self, tmp_path, monkeypatch):
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=2)
        ds = InpaintingDataset(img_dir, mask_dir, size=64, cache_bytes=0)
        assert ds._cache is None
        monkeypatch.setenv("TERRA_GAN_TPU_TILE_CACHE_MB", "0")
        ds2 = InpaintingDataset(img_dir, mask_dir, size=64)
        assert ds2._cache is None
        monkeypatch.setenv("TERRA_GAN_TPU_TILE_CACHE_MB", "1")
        ds3 = InpaintingDataset(img_dir, mask_dir, size=64)
        assert ds3._cache is not None and ds3._cache.budget == 2**20

    def test_tile_cache_stops_at_budget(self, tmp_path):
        """Insert-until-full (no LRU: cyclic epoch access would evict
        every entry right before its reuse): tiles past the budget stay
        on the decode path but still load correctly."""
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=4, size=64)
        # one 64^2 pair = 2 * 4096 B; budget of ~1.5 pairs caches one
        ds = InpaintingDataset(img_dir, mask_dir, size=64,
                               cache_bytes=3 * 4096)
        first = [ds[i] for i in range(4)]
        assert len(ds._cache._data) == 1
        for i in range(4):  # uncached indices re-decode fine
            np.testing.assert_array_equal(ds[i]["image"], first[i]["image"])

    def test_direct_match_error_item_not_cached(self, tmp_path):
        """A transient read failure must heal on a later epoch: error
        items are never cached."""
        img = tmp_path / "img.png"
        smask = tmp_path / "sys.png"
        hmask = tmp_path / "hum.png"
        rng = np.random.default_rng(0)
        Image.fromarray(
            (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255
        ).save(smask)
        Image.fromarray(
            (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255
        ).save(hmask)
        pairs = [{
            "image_path": str(img), "system_mask_path": str(smask),
            "human_mask_path": str(hmask), "tile_name": "ab0001",
        }]
        ds = DirectMatchDataset(pairs, size=64)
        assert ds[0]["tile_name"] == "error"  # img missing
        Image.fromarray(
            rng.integers(0, 255, (64, 64), dtype=np.uint8)
        ).save(img)
        item = ds[0]  # heals once the file appears
        assert item["tile_name"] == "ab0001"
        # and epoch 2 serves the cached copy even with files gone
        img.unlink()
        np.testing.assert_array_equal(ds[0]["image"], item["image"])

    def test_strict_loader_raises_without_deadlock(self, tmp_path):
        """strict=True surfaces the first bad batch as RuntimeError at
        EVERY prefetch depth. Review finding: the strict branch used to
        put a second SENTINEL, deadlocking producer (blocked put)
        against consumer (blocked t.join()) at prefetch=1."""
        import threading

        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=6)
        (img_dir / "t2.png").write_bytes(b"broken")
        ds = InpaintingDataset(img_dir, mask_dir, size=32)
        for prefetch in (1, 2):
            loader = BatchLoader(
                ds, batch_size=2, shuffle=False, strict=True,
                prefetch=prefetch,
            )
            result = {}

            def drain():
                try:
                    list(loader)
                    result["raised"] = False
                except RuntimeError as e:
                    result["raised"] = "strict mode" in str(e)

            t = threading.Thread(target=drain, daemon=True)
            t.start()
            t.join(timeout=30)
            assert not t.is_alive(), (
                f"strict BatchLoader deadlocked at prefetch={prefetch}"
            )
            assert result["raised"] is True

    def test_multi_worker_order_matches_single_worker(self, tmp_path):
        """The reorder buffer makes batch order a pure function of the
        seed: any worker count yields the identical batch stream
        (VERDICT r3 item 3 'deterministic batch order regardless of
        worker count'). Covers shuffle + ragged tail."""
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=9)
        ds = InpaintingDataset(img_dir, mask_dir, size=32)
        ref = list(BatchLoader(ds, batch_size=2, shuffle=True, seed=3,
                               num_workers=1))
        for workers in (2, 4, 8):
            got = list(BatchLoader(ds, batch_size=2, shuffle=True, seed=3,
                                   num_workers=workers))
            assert len(got) == len(ref) == 5
            for b_got, b_ref in zip(got, ref):
                np.testing.assert_array_equal(b_got["image"], b_ref["image"])
                np.testing.assert_array_equal(b_got["mask"], b_ref["mask"])

    def test_set_epoch_aligns_shuffle_stream(self, tmp_path):
        """Preemption resume: set_epoch(k) makes the next __iter__
        produce exactly the batch order epoch k would have had in an
        uninterrupted run (training/loop.py start_epoch path)."""
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=9)
        ds = InpaintingDataset(img_dir, mask_dir, size=32)
        key = lambda b: b["image"].tobytes()  # noqa: E731
        straight = BatchLoader(ds, batch_size=2, shuffle=True, seed=11)
        epochs = [[key(b) for b in straight] for _ in range(3)]
        # shuffle actually reshuffles per epoch (else this test is vacuous)
        assert epochs[0] != epochs[2]
        resumed = BatchLoader(ds, batch_size=2, shuffle=True, seed=11)
        resumed.set_epoch(2)
        assert [key(b) for b in resumed] == epochs[2]
        # and the epochs AFTER the fast-forwarded one stay aligned too
        assert [key(b) for b in resumed] == [key(b) for b in straight]

    def test_multi_worker_skip_and_strict_semantics(self, tmp_path):
        """Per-batch skip (non-strict) and first-bad-batch raise
        (strict) behave identically at any worker count."""
        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=8)
        (img_dir / "t2.png").write_bytes(b"broken")
        ds = InpaintingDataset(img_dir, mask_dir, size=32)
        ref = list(BatchLoader(ds, batch_size=2, shuffle=False,
                               num_workers=1))
        got = list(BatchLoader(ds, batch_size=2, shuffle=False,
                               num_workers=4))
        assert len(got) == len(ref) == 3  # t2's batch skipped
        for b_got, b_ref in zip(got, ref):
            np.testing.assert_array_equal(b_got["image"], b_ref["image"])
        with pytest.raises(RuntimeError, match="strict mode"):
            list(BatchLoader(ds, batch_size=2, shuffle=False, strict=True,
                             num_workers=4))

    def test_multi_worker_early_abandon_no_deadlock(self, tmp_path):
        """Watchdog: a consumer that stops mid-epoch (break) must not
        leave workers blocked on the reorder window; the loader's
        cleanup stops and joins them within the timeout."""
        import threading

        img_dir, mask_dir = self._make_pair_dirs(tmp_path, n=10)
        ds = InpaintingDataset(img_dir, mask_dir, size=32)
        done = {}

        def drain():
            loader = BatchLoader(ds, batch_size=1, shuffle=False,
                                 num_workers=4, prefetch=1)
            it = iter(loader)
            next(it)
            it.close()  # generator close runs the finally/join path
            # a fresh full iteration still works after the abandon
            done["n"] = len(list(loader))

        t = threading.Thread(target=drain, daemon=True)
        t.start()
        t.join(timeout=60)
        assert not t.is_alive(), "multi-worker BatchLoader deadlocked"
        assert done["n"] == 10

    def test_feed_workers_env_and_config(self, monkeypatch):
        from terra_gan_tpu.data.dataset import _default_feed_workers

        monkeypatch.delenv("TERRA_GAN_TPU_FEED_WORKERS", raising=False)
        import os as _os
        assert _default_feed_workers() == max(1, min(4, _os.cpu_count() or 1))
        monkeypatch.setenv("TERRA_GAN_TPU_FEED_WORKERS", "7")
        assert _default_feed_workers() == 7
        monkeypatch.setenv("TERRA_GAN_TPU_FEED_WORKERS", "0")
        assert _default_feed_workers() == 1
        from terra_gan_tpu.config import TrainingConfig
        assert TrainingConfig.from_dict(
            {"feed_workers": 3}
        ).feed_workers == 3
        assert TrainingConfig.from_dict({}).feed_workers is None


class TestMaskProcessing:
    def _synthetic_aerial(self, size=256):
        """BGR image with a grass half and a bright road stripe."""
        rng = np.random.default_rng(7)
        img = rng.integers(90, 130, (size, size, 3), dtype=np.uint8)
        img[:, : size // 2] = (40, 160, 60)  # green-ish (BGR)
        img[size // 2 - 8 : size // 2 + 8, :] = (220, 220, 220)  # road
        return np.ascontiguousarray(img)

    def test_combined_mask_is_inverted(self):
        m = {
            MaskType.ROADS: np.zeros((32, 32), np.uint8),
            MaskType.VEGETATION: np.zeros((32, 32), np.uint8),
        }
        m[MaskType.ROADS][10:20, :] = 255
        combined = combine_masks(m)
        # detected rows become 0 (holes), background 255 (preserved)
        assert (combined[10:20, :] == 0).all()
        assert (combined[:10, :] == 255).all()

    def test_pipeline_runs_all_detectors(self):
        pipe = MaskPipeline({})
        masks = pipe.process_image(self._synthetic_aerial())
        assert set(masks) == {
            MaskType.ROADS, MaskType.BUILDINGS, MaskType.VEGETATION,
            MaskType.FIELDS, MaskType.COMBINED,
        }
        assert (masks[MaskType.BUILDINGS] == 0).all()  # stub contract
        assert set(np.unique(masks[MaskType.COMBINED])) <= {0, 255}

    def test_batch_parallel(self, tmp_path):
        paths = []
        for i in range(3):
            p = tmp_path / f"a{i}.png"
            cv2.imwrite(str(p), self._synthetic_aerial(128))
            paths.append(p)
        pipe = MaskPipeline({})
        results = pipe.process_batch(paths + [tmp_path / "missing.png"])
        assert len(results) == 4
        assert results[-1] is None  # failed item -> None, no raise
        assert all(r is not None for r in results[:3])

    def test_resize_mask_to_dem(self, tmp_path):
        dem = tmp_path / "nj0001.png"
        cv2.imwrite(str(dem), np.zeros((100, 100), np.uint8))
        mask = np.zeros((400, 400), np.uint8)
        mask[:200] = 200  # non-binary on purpose
        out = resize_mask_to_dem(mask, dem)
        assert out.name == "nj0001_mask_resized.png"
        arr = cv2.imread(str(out), cv2.IMREAD_GRAYSCALE)
        assert arr.shape == (100, 100)
        assert set(np.unique(arr)) <= {0, 255}


class TestPathsAndIngest:
    def _config(self, tmp_path) -> Config:
        return Config.from_dict({
            "data": {
                "raw_dir": str(tmp_path / "raw"),
                "processed_dir": str(tmp_path / "processed"),
                "output_dir": str(tmp_path / "output"),
                "models_dir": str(tmp_path / "models"),
            },
            "mask_processing": {"visualization": {"enabled": False}},
        })

    def test_path_manager(self, tmp_path):
        pm = PathManager(self._config(tmp_path))
        assert pm.parent_from_zip(Path("x/nj05.zip")) == "NJ05"
        with pytest.raises(ValueError):
            pm.parent_from_zip(Path("x/badname123.zip"))
        paths = pm.create_parent_structure("NJ05")
        assert (paths["processed"] / "train" / "images").is_dir()
        cp = pm.child_paths("NJ05", "nj0957")
        assert cp["mask"].name == "nj0957_mask_resized.png"
        with pytest.raises(ValueError):
            pm.child_paths("NJ05", "bad")

    def test_parse_tile_xy(self):
        assert parse_tile_xy("nj0957") == (9, 57)
        assert parse_tile_xy("NJ0957") == (9, 57)
        assert parse_tile_xy("nj09") is None

    def test_ingest_zip_end_to_end(self, tmp_path):
        """Synthetic Digimap zip -> tiles, masks, registered grid."""
        cfg = self._config(tmp_path)
        rng = np.random.default_rng(9)
        src = tmp_path / "src"
        dsm = src / "getmapping-dsm-2000_1234"
        rgb = src / "getmapping_rgb_25cm_1234"
        dsm.mkdir(parents=True), rgb.mkdir(parents=True)
        for name in ("nj0000", "nj0001", "nj0100"):
            data = rng.uniform(0, 80, (100, 100))
            write_asc(dsm / f"{name}_DSM.asc", data)
            img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
            cv2.imwrite(str(rgb / f"{name}_rgb.jpg"), img)
        zip_path = tmp_path / "NJ00.zip"
        with zipfile.ZipFile(zip_path, "w") as zf:
            for p in src.rglob("*"):
                if p.is_file():
                    zf.write(p, p.relative_to(src))

        splitter = GeographicalSplitter(
            "NJ00", Path(cfg.data.processed_dir)
        )
        ok = ingest_zip(zip_path, "NJ00", cfg, splitter=splitter)
        assert ok
        raw = Path(cfg.data.processed_dir) / "NJ00" / "raw"
        assert (raw / "nj0000.png").exists()
        assert (raw / "nj0000_mask_resized.png").exists()
        assert len(splitter.tiles) == 3
        assert (0, 0) in splitter.tiles and (1, 0) in splitter.tiles
        # extraction dir cleaned up
        assert not (Path(cfg.data.raw_dir) / "NJ00_extracted").exists()


class TestAnnotationValidator:
    def _mk(self, tmp_path, name, size, values=(0, 255)):
        rng = np.random.default_rng(3)
        arr = rng.choice(values, size=size).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / name)

    def test_strict_skips_resize_fixes(self, tmp_path):
        human = tmp_path / "human"
        system = tmp_path / "system"
        human.mkdir(), system.mkdir()
        self._mk(human, "colored_nj0001_x.png", (512, 512))
        self._mk(system, "nj0001_mask_resized.png", (512, 512))
        self._mk(human, "colored_nj0002_x.png", (300, 300))  # too small
        self._mk(system, "nj0002_mask_resized.png", (512, 512))

        out = tmp_path / "strict"
        v = AnnotationValidator(resize_mode="strict")
        stats = v.validate_and_filter_pairs(
            list(human.glob("*.png")), list(system.glob("*.png")), out
        )
        assert stats["valid_pairs"] == 1 and stats["skipped_pairs"] == 1
        assert (out / "images" / "0000.png").exists()

        out2 = tmp_path / "resized"
        v2 = AnnotationValidator(resize_mode="resize")
        stats2 = v2.validate_and_filter_pairs(
            list(human.glob("*.png")), list(system.glob("*.png")), out2
        )
        assert stats2["valid_pairs"] == 2
        img = Image.open(out2 / "images" / "0001.png")
        assert img.size == (512, 512)
        with open(out2 / "validation_metadata.json") as f:
            assert json.load(f)["valid_pairs"] == 2


class TestColorizer:
    def test_lut_endpoints(self):
        lut = build_lut()
        assert tuple(lut[0]) == (0x0C, 0x6B, 0x58)
        assert tuple(lut[255]) == (255, 255, 255)

    def test_recolor_all(self, tmp_path):
        ind = tmp_path / "in"
        outd = tmp_path / "out"
        ind.mkdir()
        grad = np.tile(np.arange(256, dtype=np.uint8), (16, 1))
        cv2.imwrite(str(ind / "nj0001_inpainted.png"), grad)
        outs = DSMColorizer(ind, outd).recolor_all()
        assert len(outs) == 1
        assert outs[0].name == "nj0001_inpainted_colored.png"
        bgr = cv2.imread(str(outs[0]))
        assert tuple(bgr[0, 255]) == (255, 255, 255)
