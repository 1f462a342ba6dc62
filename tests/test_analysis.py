"""Analysis layer: terrain deception metrics, statistics, random masks,
run loading/comparison/visualization."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from terra_gan_tpu.analysis import (
    compare_runs,
    find_best_run,
    load_runs,
    parameter_impact,
    plot_all_metrics,
    plot_research_summary,
)
from terra_gan_tpu.evaluation import (
    StatisticalTester,
    TerrainEvaluator,
    cohens_d,
    generate_batch,
    generate_dem_random_mask,
    interpret_effect_size,
)
from terra_gan_tpu.tracking import ExperimentTracker
from terra_gan_tpu.config import Config


class TestTerrainEvaluator:
    def _setup(self, tmp_path):
        masks = tmp_path / "masks"
        annos = tmp_path / "annos"
        masks.mkdir(), annos.mkdir()
        # ground truth: left half AI-generated (BLACK=0), right preserved
        gt = np.full((100, 100), 255, np.uint8)
        gt[:, :50] = 0
        cv2.imwrite(str(masks / "ns8030_mask_resized.png"), gt)
        # human flags top-left quadrant (half of the AI area)
        anno = np.zeros((100, 100), np.uint8)
        anno[:50, :50] = 255
        cv2.imwrite(
            str(annos / "NS83_ns8030_inpainted_colored_Zmlu_mask.png"), anno
        )
        return masks, annos

    def test_metrics_known_values(self, tmp_path):
        masks, annos = self._setup(tmp_path)
        ev = TerrainEvaluator(masks, annos, resolution_meters=1.0)
        results = ev.evaluate_all()
        m = results["per_image"]["ns8030"]
        # AI area = 5000 px; flagged = 2500 all inside AI area
        assert m["precision"] == 1.0
        assert m["recall"] == 0.5
        assert abs(m["iou"] - 0.5) < 1e-9
        assert abs(m["undetected_percentage"] - 50.0) < 1e-9
        # undetected region = bottom-left 50x50 = 2500 m^2 = 0.0025 km^2
        assert abs(m["largest_unidentified_area_sq_km"] - 0.0025) < 1e-9
        assert results["aggregate"]["total_images"] == 1
        summary = ev.get_summary()
        assert "Deception success rate" in summary
        out = tmp_path / "r.json"
        ev.save_results(out)
        assert json.loads(out.read_text())["aggregate"]["mean_f1"] > 0

    def test_tile_id_extraction(self):
        f = TerrainEvaluator.extract_tile_id
        assert f("NS83_ns8030_inpainted_colored_Zmlu_mask.png") == "ns8030"
        assert f("ns8030_mask_resized.png") == "ns8030"
        assert f("random.png") is None


class TestStatistics:
    def _experiments(self):
        rng = np.random.default_rng(0)
        def exp(shift):
            return {"per_image": {
                f"t{i}": {
                    "iou": float(0.5 + shift + rng.normal(0, 0.02)),
                    "precision": 0.7, "recall": 0.6, "f1": 0.65,
                    "largest_unidentified_area_sq_km": 0.01,
                    "undetected_percentage": 40.0 + shift * 100,
                }
                for i in range(20)
            }}
        return exp(0.0), exp(0.2)

    def test_detects_difference(self, tmp_path):
        a, b = self._experiments()
        t = StatisticalTester([a, b], ["base", "better"])
        results = t.run()
        comp = results["comparisons"]["base_vs_better"]["iou"]
        assert comp["significant"]
        assert comp["effect_size"] == "large"
        assert comp["mean_difference"] < 0
        assert "descriptive" in results
        out = tmp_path / "stats.json"
        t.save_results(out)
        assert out.exists()

    def test_paired_mode(self):
        a, b = self._experiments()
        t = StatisticalTester([a, b], paired=True)
        res = t.run()
        key = next(iter(res["comparisons"]))
        assert res["comparisons"][key]["iou"]["test"] == "paired_t"

    def test_effect_size_labels(self):
        assert interpret_effect_size(0.1) == "negligible"
        assert interpret_effect_size(0.3) == "small"
        assert interpret_effect_size(0.6) == "medium"
        assert interpret_effect_size(1.5) == "large"
        assert cohens_d(np.zeros(5), np.zeros(5)) == 0.0


class TestRandomMasks:
    def test_density_clamped_and_seeded(self):
        for style in ("ridge", "patch", "region"):
            m = generate_dem_random_mask(128, seed=1, style=style)
            assert m.shape == (128, 128)
            assert set(np.unique(m)) <= {0, 255}
            frac = (m > 0).mean()
            assert 0.005 <= frac <= 0.35, (style, frac)
        a = generate_dem_random_mask(128, seed=5)
        b = generate_dem_random_mask(128, seed=5)
        assert (a == b).all()
        c = generate_dem_random_mask(128, seed=6)
        assert (a != c).any()

    def test_batch_naming_and_stats(self, tmp_path):
        stats = generate_batch(
            tmp_path, ["ns8030", "ns8031"], grid="NS83", size=64, seed=0
        )
        assert (
            tmp_path / "NS83_ns8030_inpainted_colored_random_mask.png"
        ).exists()
        assert (tmp_path / "random_mask_stats.json").exists()
        assert stats["mean_density"] > 0
        # naming is parseable by the terrain evaluator (null-baseline flow)
        tid = TerrainEvaluator.extract_tile_id(
            "NS83_ns8030_inpainted_colored_random_mask.png"
        )
        assert tid == "ns8030"


class TestAnalysisRuns:
    def _store(self, tmp_path):
        cfg = Config.from_dict({
            "experiment_tracking": {
                "enabled": True, "tracking_uri": f"file:{tmp_path}/mlruns"
            }
        })
        for i, lr in enumerate((1e-3, 1e-4)):
            tr = ExperimentTracker(
                cfg, flush_interval=0.0, force_file_store=True
            )
            tr.start_run(f"train_run{i}", params={"lr": lr})
            for step in range(5):
                tr.log_metrics(
                    {"epoch.g_loss": 1.0 / (step + 1) + i * 0.5}, step=step
                )
            tr.end_run()
        return f"{tmp_path}/mlruns"

    def test_load_compare_best(self, tmp_path):
        store = self._store(tmp_path)
        runs = load_runs(store)
        assert len(runs) == 2
        assert all(r.run_type == "train" for r in runs)
        table = compare_runs(runs)
        assert all("epoch.g_loss" in v for v in table.values())
        best = find_best_run(runs, "epoch.g_loss")
        assert best is not None and abs(best[1] - 0.2) < 1e-9
        impact = parameter_impact(runs, "epoch.g_loss")
        assert "lr" in impact

    def test_plots(self, tmp_path):
        store = self._store(tmp_path)
        runs = load_runs(store)
        written = plot_all_metrics(runs, tmp_path / "plots")
        assert len(written) >= 1
        assert all(p.exists() for p in written)
        summary = plot_research_summary(runs, tmp_path / "summary.png")
        assert summary is not None and summary.exists()
