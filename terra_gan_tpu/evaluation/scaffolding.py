"""Evaluation scaffolding (reference: mvp_gan/src/evaluation/
{evaluator,results,visualization,sampling}.py).

The reference versions are partially broken (evaluator.py imports a
module that doesn't exist; sampling.py is empty — SURVEY §2.1). These
are working equivalents with the same roles:

  * GANEvaluator — run the generator over an evaluation dataset and
    aggregate image-quality + boundary metrics per tile.
  * MetricsAggregator — running mean/min/max accumulation.
  * ResultsManager — JSON save/load of evaluation results.
  * comparison_figure — 2x2 (input / mask / output / target) panel.
  * sample_annotation_tiles — deterministic sampling of tiles for
    human annotation at evaluation.sampling.annotation_ratio.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from .metrics import boundary_quality, image_quality_metrics

logger = logging.getLogger(__name__)


class MetricsAggregator:
    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._mins: Dict[str, float] = {}
        self._maxs: Dict[str, float] = {}
        self._count = 0

    def update(self, metrics: Dict[str, float]) -> None:
        self._count += 1
        for k, v in metrics.items():
            v = float(v)
            if not np.isfinite(v):
                continue
            self._sums[k] = self._sums.get(k, 0.0) + v
            self._mins[k] = min(self._mins.get(k, v), v)
            self._maxs[k] = max(self._maxs.get(k, v), v)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "mean": self._sums[k] / max(1, self._count),
                "min": self._mins[k],
                "max": self._maxs[k],
            }
            for k in self._sums
        }

    @property
    def count(self) -> int:
        return self._count


class GANEvaluator:
    """Runs eval-mode inference over a dataset and aggregates metrics."""

    def __init__(self, generator, variables: Dict[str, Any]):
        self.generator = generator
        self.variables = variables
        self._fwd = jax.jit(
            lambda v, x, m: generator.apply(v, x * m, m, False)
        )
        self._metrics = jax.jit(
            lambda pred, target, mask: {
                **image_quality_metrics(pred, target),
                **boundary_quality(pred, target, mask),
            }
        )

    def evaluate_dataset(self, dataset) -> Dict[str, Any]:
        import jax.numpy as jnp

        agg = MetricsAggregator()
        per_tile: Dict[str, Dict[str, float]] = {}
        for i in range(len(dataset)):
            item = dataset[i]
            x = jnp.asarray(item["image"])[None]
            m = jnp.asarray(item["mask"])[None]
            pred = self._fwd(self.variables, x, m)
            vals = {
                k: float(v) for k, v in self._metrics(pred, x, m).items()
            }
            name = item.get("tile_name") or f"tile_{i:04d}"
            per_tile[name] = vals
            agg.update(vals)
        return {"per_tile": per_tile, "aggregate": agg.summary(),
                "count": agg.count}


class ResultsManager:
    """JSON persistence of evaluation results (results.py:6-21)."""

    def __init__(self, results_dir: str | Path):
        self.results_dir = Path(results_dir)
        self.results_dir.mkdir(parents=True, exist_ok=True)

    def save(self, name: str, results: Dict) -> Path:
        path = self.results_dir / f"{name}.json"
        with open(path, "w") as f:
            json.dump(results, f, indent=2, default=float)
        return path

    def load(self, name: str) -> Dict:
        with open(self.results_dir / f"{name}.json") as f:
            return json.load(f)

    def list_results(self) -> List[str]:
        return sorted(p.stem for p in self.results_dir.glob("*.json"))


def comparison_figure(
    image: np.ndarray,
    mask: np.ndarray,
    output: np.ndarray,
    target: Optional[np.ndarray] = None,
    save_path: Optional[str | Path] = None,
):
    """2x2 input/mask/output/target panel (visualization.py:8-31)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        ("masked input", np.squeeze(image * mask)),
        ("mask", np.squeeze(mask)),
        ("inpainted", np.squeeze(output)),
        ("target", np.squeeze(target if target is not None else image)),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(10, 10))
    for ax, (title, img) in zip(axes.ravel(), panels):
        ax.imshow(img, cmap="gray", vmin=0, vmax=1)
        ax.set_title(title)
        ax.axis("off")
    if save_path:
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        return save_path
    return fig


def sample_annotation_tiles(
    tile_names: Sequence[str],
    annotation_ratio: float = 0.01,
    minimum: int = 1,
    seed: int = 0,
) -> List[str]:
    """Deterministic sample of tiles for human annotation
    (config.yaml:24-25 evaluation.sampling.annotation_ratio)."""
    n = max(minimum, int(round(len(tile_names) * annotation_ratio)))
    n = min(n, len(tile_names))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(tile_names), size=n, replace=False)
    return [tile_names[i] for i in sorted(idx)]
