"""Training telemetry helpers (reference: mvp_gan/src/utils/metrics.py
TrainingMetrics/MetricsLogger).

  * gradient_norms — per-top-level-block L2 norms + the global norm of
    a gradient pytree (reference logs per-parameter norms,
    metrics.py:48-64; per-block keeps the metric count sane at 33M
    params). Computed on device in one jitted reduction.
  * learning_rates — extracts the current lr from an optax
    transformation or schedule (metrics.py:66-69).
  * MetricsLogger — batch-level aggregation façade combining quality,
    gradient, and resource metrics (metrics.py:104-165).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def gradient_norms(grads: Any, prefix: str = "grad_norm") -> Dict[str, jnp.ndarray]:
    """Per-top-level-block L2 norms + total; all on-device scalars."""
    out: Dict[str, jnp.ndarray] = {}
    total_sq = jnp.zeros((), jnp.float32)
    if isinstance(grads, dict):
        items = grads.items()
    else:
        items = [("all", grads)]
    for name, subtree in items:
        sq = sum(
            jnp.sum(jnp.square(leaf.astype(jnp.float32)))
            for leaf in jax.tree.leaves(subtree)
        )
        out[f"{prefix}_{name}"] = jnp.sqrt(sq)
        total_sq = total_sq + sq
    out[f"total_{prefix}"] = jnp.sqrt(total_sq)
    return out


def learning_rates(
    tx_or_schedule: Union[Callable, Any], step: int = 0
) -> Dict[str, float]:
    """Current learning rate(s) from a schedule fn or constant."""
    if callable(tx_or_schedule):
        try:
            return {"lr_group_0": float(tx_or_schedule(step))}
        except TypeError:
            pass
    if isinstance(tx_or_schedule, (int, float)):
        return {"lr_group_0": float(tx_or_schedule)}
    return {}


class MetricsLogger:
    """Aggregates quality + gradient + resource metrics per batch."""

    def __init__(self, tracker=None):
        self.tracker = tracker
        self._quality_fn: Optional[Callable] = None

    def log_batch(
        self,
        pred=None,
        target=None,
        grads=None,
        batch_metrics: Optional[Dict[str, float]] = None,
        step: Optional[int] = None,
        lr: Optional[float] = None,
    ) -> Dict[str, float]:
        from ..evaluation.metrics import image_quality_metrics, resource_metrics

        out: Dict[str, float] = dict(batch_metrics or {})
        if pred is not None and target is not None:
            if self._quality_fn is None:
                self._quality_fn = jax.jit(image_quality_metrics)
            out.update(
                {k: float(v) for k, v in self._quality_fn(pred, target).items()}
            )
        if grads is not None:
            out.update(
                {k: float(v) for k, v in gradient_norms(grads).items()}
            )
        if lr is not None:
            out.update(learning_rates(lr, step or 0))
        out.update(resource_metrics())
        if self.tracker is not None:
            self.tracker.log_metrics(
                {f"batch.{k}": v for k, v in out.items()}, step=step
            )
        return out
