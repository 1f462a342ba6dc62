"""Perf/resource metrics module (training/train_metrics.py) — the
counterpart of the reference's mvp_gan/src/utils/metrics.py (grad
norms, lr reporting, MetricsLogger aggregation, psutil telemetry)."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from terra_gan_tpu.training.train_metrics import (  # noqa: E402
    MetricsLogger,
    gradient_norms,
    learning_rates,
)


class TestGradientNorms:
    def test_per_block_and_total(self):
        grads = {
            "enc1": {"kernel": jnp.full((2, 2), 3.0)},
            "dec1": {"kernel": jnp.full((4,), 4.0)},
        }
        out = {k: float(v) for k, v in gradient_norms(grads).items()}
        assert out["grad_norm_enc1"] == pytest.approx(6.0)  # sqrt(4*9)
        assert out["grad_norm_dec1"] == pytest.approx(8.0)  # sqrt(4*16)
        assert out["total_grad_norm"] == pytest.approx(10.0)  # 6-8-10

    def test_non_dict_tree(self):
        out = gradient_norms(jnp.ones((3,)) * 2.0)
        assert float(out["total_grad_norm"]) == pytest.approx(
            np.sqrt(12.0)
        )


class TestLearningRates:
    def test_constant_and_schedule(self):
        assert learning_rates(2e-4) == {"lr_group_0": pytest.approx(2e-4)}
        sched = lambda step: 1e-3 * 0.5 ** step  # noqa: E731
        assert learning_rates(sched, step=1)["lr_group_0"] == pytest.approx(
             5e-4
        )
        assert learning_rates(object()) == {}


class _CapturingTracker:
    def __init__(self):
        self.logged = []

    def log_metrics(self, metrics, step=None):
        self.logged.append((metrics, step))


class TestMetricsLogger:
    def test_aggregates_quality_grads_resources(self):
        tracker = _CapturingTracker()
        ml = MetricsLogger(tracker=tracker)
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
        out = ml.log_batch(
            pred=pred,
            target=pred,  # identical -> psnr capped, ssim ~1
            grads={"g": {"w": jnp.ones((2,))}},
            batch_metrics={"g_loss": 0.5},
            step=7,
            lr=2e-4,
        )
        assert out["g_loss"] == 0.5
        assert out["grad_norm_g"] == pytest.approx(np.sqrt(2.0))
        assert out["lr_group_0"] == pytest.approx(2e-4)
        # resource telemetry present (psutil-backed, reference
        # utils/metrics.py:71-102 analogue)
        assert any(k.startswith("system") or "cpu" in k for k in out)
        metrics, step = tracker.logged[-1]
        assert step == 7
        assert all(k.startswith("batch.") for k in metrics)
