"""Golden-layout test: the zero-dep file store must emit the MLflow
file-store layout the reference's offline tooling reads directly.

The strongest check runs the *actual reference visualizer*
(/root/reference/mlflow_metrics_visualizer.py) as an oracle against a
store written by this framework's tracker: it must discover the
experiment, the runs, classify their types, parse every metric point,
and render a plot — all with mlflow absent. Skips cleanly when the
reference isn't mounted.
"""

import importlib.util
import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from terra_gan_tpu.config import Config
from terra_gan_tpu.tracking import ExperimentTracker

REF_VIZ = Path("/root/reference/mlflow_metrics_visualizer.py")


def _write_store(tmp_path, experiment="dsm_inpainting"):
    """Two training runs + one evaluation run through the real tracker."""
    cfg = Config.from_dict(
        {
            "experiment_tracking": {
                "enabled": True,
                "experiment_name": experiment,
                "tracking_uri": f"file:{tmp_path}/mlruns",
            }
        }
    )
    run_ids = []
    for name, metric, n in (
        ("training_run_1", "epoch.g_loss", 6),
        ("training_run_2", "epoch.g_loss", 6),
        ("evaluation_run_1", "evaluation.psnr", 3),
    ):
        tr = ExperimentTracker(cfg, flush_interval=0.0, force_file_store=True)
        run_ids.append(tr.start_run(name, params={"training": {"lr": 2e-4}}))
        for step in range(n):
            tr.log_metrics({metric: 1.0 / (step + 1)}, step=step)
        tr.end_run()
    return Path(f"{tmp_path}/mlruns"), experiment, run_ids


class TestMlrunsLayout:
    def test_golden_tree(self, tmp_path):
        root, experiment, run_ids = _write_store(tmp_path)
        exp_dir = root / experiment

        # experiment meta.yaml matches the shape reset_mlflow.sh:55-68 creates
        meta = (exp_dir / "meta.yaml").read_text()
        assert f"name: {experiment}" in meta
        assert "lifecycle_stage: active" in meta
        assert re.search(r"creation_time: \d{13}", meta)

        for rid in run_ids:
            run_dir = exp_dir / rid
            assert re.fullmatch(r"[0-9a-f]{32}", rid)  # mlflow-style run id
            run_meta = (run_dir / "meta.yaml").read_text()
            assert f"run_id: {rid}" in run_meta
            assert "status: FINISHED" in run_meta
            assert re.search(r"end_time: \d{13}", run_meta)
            # tags as one-file-per-tag including mlflow.runName
            assert (run_dir / "tags" / "mlflow.runName").exists()
            assert (run_dir / "params" / "training.lr").read_text() == "0.0002"
            assert (run_dir / "artifacts").is_dir()

        # metric files: "timestamp_ms value step" lines, ascending steps
        mfile = exp_dir / run_ids[0] / "metrics" / "epoch.g_loss"
        lines = mfile.read_text().splitlines()
        assert len(lines) == 6
        steps = []
        for line in lines:
            ts, value, step = line.split()
            assert len(ts) == 13 and ts.isdigit()
            float(value)
            steps.append(int(step))
        assert steps == list(range(6))

    def test_nonfinite_metrics_dropped(self, tmp_path):
        root, experiment, (rid, *_) = _write_store(tmp_path)
        tr = ExperimentTracker(
            Config.from_dict(
                {
                    "experiment_tracking": {
                        "enabled": True,
                        "experiment_name": experiment,
                        "tracking_uri": f"file:{root}",
                    }
                }
            ),
            flush_interval=0.0,
            force_file_store=True,
        )
        rid = tr.start_run("nan_run")
        tr.log_metrics({"batch.loss": float("nan"), "batch.ok": 1.0}, step=0)
        tr.end_run()
        run_dir = root / experiment / rid
        assert not (run_dir / "metrics" / "batch.loss").exists()
        assert (run_dir / "metrics" / "batch.ok").exists()

    def test_analysis_loader_reads_layout(self, tmp_path):
        from terra_gan_tpu.analysis import load_runs

        root, _, _ = _write_store(tmp_path)
        runs = load_runs(root)
        assert len(runs) == 3
        by_name = {r.name: r for r in runs}
        assert "training_run_1" in by_name
        steps, vals = by_name["training_run_1"].metrics["epoch.g_loss"]
        assert list(steps) == list(range(6))
        assert abs(vals[-1] - 1.0 / 6) < 1e-12
        assert by_name["training_run_1"].params["training.lr"] == "0.0002"


@pytest.mark.skipif(not REF_VIZ.exists(), reason="reference not mounted")
class TestReferenceVisualizerOracle:
    """The reference's own file-store scanner must read our runs."""

    def _load_viz_module(self):
        import matplotlib

        matplotlib.use("Agg")
        spec = importlib.util.spec_from_file_location("_ref_mlflow_viz", REF_VIZ)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_reference_visualizer_reads_our_store(self, tmp_path):
        root, experiment, run_ids = _write_store(tmp_path)
        mod = self._load_viz_module()
        viz = mod.MLflowMetricsVisualizer(
            experiment_name=experiment,
            mlruns_dir=str(root),
            output_dir=str(tmp_path / "viz_out"),
        )
        runs = viz.scan_runs()
        assert set(runs) == set(run_ids)
        assert len(viz.run_types["training_runs"]) == 2
        assert len(viz.run_types["evaluation_runs"]) == 1

        metrics = viz.collect_metrics_data()
        assert set(metrics["epoch.g_loss"]) == set(run_ids[:2])
        pts = metrics["epoch.g_loss"][run_ids[0]]
        assert len(pts) == 6
        # (timestamp, value, step) triples, parsed by the reference itself
        assert pts[0][2] == 0 and abs(pts[-1][1] - 1.0 / 6) < 1e-12

        # end-to-end: the reference renders a plot from our store
        out = viz.plot_metric("epoch.g_loss", run_type="training_runs")
        assert out is not None and Path(out).exists()


class TestBackToBackRuns:
    def test_second_run_gets_own_metric_files(self, tmp_path):
        """start_run without end_run must not leak the previous run's
        open metric handles into the new run (crash-recovery case)."""
        from terra_gan_tpu.tracking.tracker import FileStoreBackend

        b = FileStoreBackend(str(tmp_path / "mlruns"), "exp")
        r1 = b.start_run("one", {})
        b.log_metrics({"m": 1.0}, step=0)
        r2 = b.start_run("two", {})  # no end_run: simulated crash
        b.log_metrics({"m": 2.0}, step=0)
        b.end_run()
        root = tmp_path / "mlruns" / "exp"
        m1 = (root / r1 / "metrics" / "m").read_text().strip().splitlines()
        m2 = (root / r2 / "metrics" / "m").read_text().strip().splitlines()
        assert len(m1) == 1 and m1[0].split()[1] == "1.0"
        assert len(m2) == 1 and m2[0].split()[1] == "2.0"
