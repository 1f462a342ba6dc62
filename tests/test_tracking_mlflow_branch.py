"""The tracker's MlflowBackend branch, exercised against a fake mlflow.

mlflow is not installed in this environment, so the MlflowBackend code
path (tracking/tracker.py:184-214) otherwise never executes in CI —
flagged as a round-1 weak spot. This installs a minimal in-memory fake
of the mlflow API surface the backend uses (the same strategy as
tests/fake_portal.py for the HTTP layer) and drives the tracker
through it: backend selection, run lifecycle, metric-name cleaning,
nonfinite filtering, param truncation, artifact logging.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


class _FakeRunInfo:
    def __init__(self, run_id):
        self.run_id = run_id


class _FakeRun:
    def __init__(self, run_id):
        self.info = _FakeRunInfo(run_id)


def make_fake_mlflow():
    """A types.ModuleType implementing the API MlflowBackend touches."""
    m = types.ModuleType("mlflow")
    m.calls = []
    m.metrics = []
    m.params = {}
    m.artifacts = []
    m.active = None

    def set_tracking_uri(uri):
        m.calls.append(("set_tracking_uri", uri))

    def set_experiment(name):
        m.calls.append(("set_experiment", name))

    def start_run(run_name=None, tags=None):
        m.calls.append(("start_run", run_name, dict(tags or {})))
        m.active = _FakeRun(f"fake-{len(m.calls)}")
        return m.active

    def log_params(params):
        m.params.update(params)

    def log_metrics(metrics, step=None):
        m.metrics.append((dict(metrics), step))

    def log_artifact(path):
        m.artifacts.append(path)

    def end_run():
        m.calls.append(("end_run",))
        m.active = None

    m.set_tracking_uri = set_tracking_uri
    m.set_experiment = set_experiment
    m.start_run = start_run
    m.log_params = log_params
    m.log_metrics = log_metrics
    m.log_artifact = log_artifact
    m.end_run = end_run
    return m


@pytest.fixture()
def fake_mlflow(monkeypatch):
    fake = make_fake_mlflow()
    monkeypatch.setitem(sys.modules, "mlflow", fake)
    return fake


class TestMlflowBackendBranch:
    def _tracker(self, tmp_path, **kw):
        from terra_gan_tpu.tracking.tracker import ExperimentTracker

        return ExperimentTracker(
            config={
                "experiment_tracking": {
                    "enabled": True,
                    "experiment_name": "exp1",
                    "tracking_uri": f"file:{tmp_path}/mlruns",
                }
            },
            flush_interval=0.0,
            **kw,
        )

    def test_backend_selection_prefers_mlflow(self, tmp_path, fake_mlflow):
        from terra_gan_tpu.tracking.tracker import MlflowBackend

        t = self._tracker(tmp_path)
        assert isinstance(t.backend, MlflowBackend)
        assert ("set_experiment", "exp1") in fake_mlflow.calls

    def test_run_lifecycle_and_metric_cleaning(self, tmp_path, fake_mlflow):
        t = self._tracker(tmp_path)
        run_id = t.start_run("train_run", params={"lr": 2e-4})
        assert run_id and run_id.startswith("fake-")
        t.log_metrics(
            {"batch.g=loss": 0.5, "batch.bad": float("nan"),
             "batch.d_loss": 1.25},
            step=3,
        )
        t.end_run()
        merged = {}
        for metrics, step in fake_mlflow.metrics:
            merged.update(metrics)
            assert step == 3
        # '=' is illegal in mlflow metric names -> replaced
        assert "batch.g_loss" in merged and merged["batch.g_loss"] == 0.5
        # nonfinite values are filtered, not logged
        assert not any("bad" in k for k in merged)
        assert merged["batch.d_loss"] == 1.25
        assert ("end_run",) in fake_mlflow.calls

    def test_param_truncation(self, tmp_path, fake_mlflow):
        t = self._tracker(tmp_path)
        t.start_run("r", params={"huge": "x" * 1000})
        assert len(fake_mlflow.params["huge"]) == 250

    def test_force_file_store_ignores_mlflow(self, tmp_path, fake_mlflow):
        from terra_gan_tpu.tracking.tracker import FileStoreBackend

        t = self._tracker(tmp_path, force_file_store=True)
        assert isinstance(t.backend, FileStoreBackend)

    def test_glue_setup_uses_fake(self, tmp_path, fake_mlflow, monkeypatch):
        import terra_gan_tpu.tracking.glue as glue
        from terra_gan_tpu.tracking.tracker import MlflowBackend

        monkeypatch.setattr(glue, "_tracker", None, raising=False)
        t = glue.setup_mlflow(config={
            "experiment_tracking": {
                "enabled": True,
                "experiment_name": "exp2",
                "tracking_uri": f"file:{tmp_path}/mlruns",
            }
        })
        assert isinstance(t.backend, MlflowBackend)
        assert glue.get_tracker() is t
