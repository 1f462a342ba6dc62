"""Cross-experiment statistical testing (reference:
result_metrics_statistical_significance.py).

Compares per-image metrics (the TerrainEvaluator JSON layout) between
experiments:
  * Welch t-test, or paired t-test on the tile intersection when
    --paired (reference :201-206)
  * Mann-Whitney U (two-sided) (:208-210)
  * Cohen's d with the conventional small/medium/large interpretation
    (:212-237)
  * descriptive statistics (mean/std/median/min/max/n) per metric
  * JSON report + human-readable summary (:239-313)

CLI: python -m terra_gan_tpu.evaluation.statistics
        --experiments a.json b.json [--names A B] [--paired]
        [--significance-level 0.05] [--output out.json]
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

METRICS = (
    "iou", "precision", "recall", "f1",
    "largest_unidentified_area_sq_km", "undetected_percentage",
)


def interpret_effect_size(d: float) -> str:
    ad = abs(d)
    if ad < 0.2:
        return "negligible"
    if ad < 0.5:
        return "small"
    if ad < 0.8:
        return "medium"
    return "large"


def cohens_d(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = len(a), len(b)
    if na < 2 or nb < 2:
        return 0.0
    pooled = np.sqrt(
        ((na - 1) * np.var(a, ddof=1) + (nb - 1) * np.var(b, ddof=1))
        / (na + nb - 2)
    )
    if pooled == 0:
        return 0.0
    return float((np.mean(a) - np.mean(b)) / pooled)


class StatisticalTester:
    def __init__(
        self,
        experiments: List[Dict],
        experiment_names: Optional[List[str]] = None,
        significance_level: float = 0.05,
        paired: bool = False,
    ):
        self.experiments = experiments
        self.names = experiment_names or [
            f"experiment_{i}" for i in range(len(experiments))
        ]
        self.alpha = significance_level
        self.paired = paired
        self.per_image = self._extract_per_image()
        self.results: Dict = {}

    def _extract_per_image(self) -> List[Dict[str, Dict[str, float]]]:
        out = []
        for exp in self.experiments:
            per = exp.get("per_image", exp)
            out.append(per)
        return out

    def descriptive_statistics(self) -> Dict:
        stats: Dict = {}
        for name, per in zip(self.names, self.per_image):
            stats[name] = {}
            for metric in METRICS:
                vals = np.array(
                    [v[metric] for v in per.values() if metric in v]
                )
                if vals.size == 0:
                    continue
                stats[name][metric] = {
                    "mean": float(vals.mean()),
                    "std": float(vals.std(ddof=1)) if vals.size > 1 else 0.0,
                    "median": float(np.median(vals)),
                    "min": float(vals.min()),
                    "max": float(vals.max()),
                    "n": int(vals.size),
                }
        return stats

    def _values(self, idx: int, metric: str, tiles=None) -> np.ndarray:
        per = self.per_image[idx]
        if tiles is None:
            return np.array([v[metric] for v in per.values() if metric in v])
        return np.array([per[t][metric] for t in tiles])

    def run_statistical_tests(self) -> Dict:
        from scipy import stats as sps

        comparisons: Dict = {}
        for i in range(len(self.per_image)):
            for j in range(i + 1, len(self.per_image)):
                key = f"{self.names[i]}_vs_{self.names[j]}"
                comparisons[key] = {}
                shared = None
                if self.paired:
                    shared = sorted(
                        set(self.per_image[i]) & set(self.per_image[j])
                    )
                for metric in METRICS:
                    a = self._values(i, metric, shared)
                    b = self._values(j, metric, shared)
                    if a.size < 2 or b.size < 2:
                        continue
                    if self.paired and shared:
                        t_stat, t_p = sps.ttest_rel(a, b)
                        test_name = "paired_t"
                    else:
                        t_stat, t_p = sps.ttest_ind(a, b, equal_var=False)
                        test_name = "welch_t"
                    try:
                        u_stat, u_p = sps.mannwhitneyu(
                            a, b, alternative="two-sided"
                        )
                    except ValueError:
                        u_stat, u_p = float("nan"), 1.0
                    d = cohens_d(a, b)
                    comparisons[key][metric] = {
                        "test": test_name,
                        "t_statistic": float(t_stat),
                        "t_p_value": float(t_p),
                        "mann_whitney_u": float(u_stat),
                        "mann_whitney_p": float(u_p),
                        "cohens_d": d,
                        "effect_size": interpret_effect_size(d),
                        "significant": bool(t_p < self.alpha),
                        "mean_difference": float(a.mean() - b.mean()),
                    }
        return comparisons

    def create_summary_report(self) -> str:
        lines = ["=== Statistical Significance Report ==="]
        for key, metrics in self.results.get("comparisons", {}).items():
            lines.append(f"\n{key}:")
            for metric, r in metrics.items():
                sig = "SIGNIFICANT" if r["significant"] else "not significant"
                lines.append(
                    f"  {metric}: diff={r['mean_difference']:+.4f} "
                    f"p={r['t_p_value']:.4f} ({sig}), "
                    f"d={r['cohens_d']:.3f} ({r['effect_size']})"
                )
        return "\n".join(lines)

    def run(self) -> Dict:
        self.results = {
            "significance_level": self.alpha,
            "paired": self.paired,
            "descriptive": self.descriptive_statistics(),
            "comparisons": self.run_statistical_tests(),
        }
        self.results["summary"] = self.create_summary_report()
        return self.results

    def save_results(self, path: str | Path) -> None:
        with open(path, "w") as f:
            json.dump(self.results, f, indent=2)


def load_experiment_file(path: str | Path) -> Dict:
    with open(path) as f:
        return json.load(f)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="Statistical significance testing between experiments"
    )
    p.add_argument("--experiments", nargs="+", required=True)
    p.add_argument("--names", nargs="+")
    p.add_argument("--output", default=None)
    p.add_argument("--significance-level", type=float, default=0.05)
    p.add_argument("--paired", action="store_true")
    args = p.parse_args(argv)

    exps = [load_experiment_file(f) for f in args.experiments]
    names = args.names or [Path(f).stem for f in args.experiments]
    tester = StatisticalTester(
        exps, names, significance_level=args.significance_level,
        paired=args.paired,
    )
    tester.run()
    print(tester.results["summary"])
    if args.output:
        tester.save_results(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
