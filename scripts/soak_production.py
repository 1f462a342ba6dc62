"""Production-schedule soak with a mid-run preemption (r4 verdict #5).

Runs the REFERENCE's production schedule — 100 epochs, batch from
config, checkpoint_interval 5, best-model selection on validation
g-loss (/root/reference/config.yaml:8-10, train.py:314-405) — through
the real CLI on a synthetic Digimap parent, with every round-3/4
subsystem that has never co-run for hours active at once: async
checkpointing, the decoded-tile cache, the multi-worker feed, and
file-store experiment tracking. At ~epoch 40 the trainer gets a REAL
``SIGTERM`` (not the injected drill): it must save ``preempted.pth``
and exit 75; re-running the same command must resume — optimizer
moments intact, best-model master untouched — and run to epoch 100.

Verified at the end, printed as one JSON line:
  * exit codes 75 then 0;
  * loss-curve continuity: every epoch 0..99 logged exactly once
    across the two runs' metric series (no reset, no gap, no repeat);
  * best-model semantics: the tracker's last best_model_validation
    write is at the argmin of the combined validation.g_loss series
    (the during-training best survives the preemption because the
    resumed run inherits best_val instead of a fresh inf), while the
    final master checkpoint holds the FINAL epoch's state — the
    reference's own end-of-pipeline contract, which overwrites master
    with the final weights (main_pipeline.py:386-412);
  * the produced mlruns tree loads in analysis/runs.py.

Usage: python scripts/soak_production.py [--epochs 100]
           [--preempt-epoch 40] [--grid 9] [--asc-size 250]
           [--workdir /tmp/soak_r5]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))


def build_workspace(work: Path, grid: int, asc_size: int,
                    epochs: int) -> None:
    import cv2
    import numpy as np
    import yaml

    from synthetic_demo import fractal_terrain
    from terra_gan_tpu.data.asc import write_asc

    work.mkdir(parents=True, exist_ok=True)
    cfg = {
        "training": {
            "loss_weights": {"perceptual": 0.1, "tv": 0.1, "boundary": 0},
            "modes": {
                "initial": {
                    "epochs": epochs, "batch_size": 8,
                    "learning_rate": 2e-4, "checkpoint_interval": 5,
                },
                "human_guided": {
                    "epochs": 1, "batch_size": 2, "learning_rate": 1e-4,
                    "human_feedback_weight": 0.3, "base_loss_weight": 0.7,
                },
            },
            "compute_dtype": "bfloat16",
            "async_checkpoint": True,
            "feed_workers": 2,
        },
        "evaluation": {"checkpoint_dir": "ckpts"},
        "mask_processing": {"visualization": {"enabled": False}},
        "experiment_tracking": {
            "enabled": True,
            "tracking_uri": "file:./mlruns",
            "experiment_name": "soak_r5",
        },
        "data": {
            "raw_dir": "data/raw", "processed_dir": "data/processed",
            "output_dir": "data/output", "input_zip_folder": "data/zips",
            "models_dir": "data/models", "image_size": 512,
        },
    }
    with open(work / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    rng = np.random.default_rng(7)
    src = work / "src"
    dsm = src / "getmapping-dsm-2000_x"
    rgb = src / "getmapping_rgb_25cm_x"
    dsm.mkdir(parents=True, exist_ok=True)
    rgb.mkdir(parents=True, exist_ok=True)
    for x in range(grid):
        for y in range(grid):
            name = f"nj{x:02d}{y:02d}"
            terr = fractal_terrain(rng, asc_size) * 90.0 + 5.0
            write_asc(dsm / f"{name}_DSM.asc", terr)
            img = rng.integers(60, 200, (128, 128, 3), dtype=np.uint8)
            cv2.imwrite(str(rgb / f"{name}_rgb.jpg"), img)
    (work / "data/zips").mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(work / "data/zips/NJ00.zip", "w") as zf:
        for p in src.rglob("*"):
            if p.is_file():
                zf.write(p, p.relative_to(src))


def max_ckpt_epoch(work: Path) -> int:
    best = 0
    for p in glob.glob(str(work / "ckpts" / "checkpoint_epoch_*")):
        m = re.search(r"checkpoint_epoch_(\d+)", p)
        if m:
            best = max(best, int(m.group(1)))
    return best


def run_until_epoch(work: Path, env, preempt_epoch: int,
                    timeout_s: float):
    """Launch the trainer; SIGTERM it once epoch `preempt_epoch` has a
    periodic checkpoint on disk. Returns (exit_code, wall_s)."""
    t0 = time.time()
    with open(work / "soak_run1.log", "w") as logf:
        proc = subprocess.Popen(
            [sys.executable, "-m", "terra_gan_tpu.cli.main_pipeline",
             "--mode", "train", "--config", "config.yaml"],
            cwd=work, env=env, stdout=logf, stderr=subprocess.STDOUT,
        )
        sent = False
        while proc.poll() is None:
            if time.time() - t0 > timeout_s:
                proc.kill()
                raise TimeoutError("run 1 exceeded its budget")
            if not sent and max_ckpt_epoch(work) >= preempt_epoch:
                proc.send_signal(signal.SIGTERM)
                sent = True
            time.sleep(2.0)
    if not sent:
        raise RuntimeError(
            f"trainer finished before epoch {preempt_epoch}; "
            "raise --epochs or lower --preempt-epoch"
        )
    return proc.returncode, time.time() - t0


def epoch_series(work: Path, metric: str):
    """{epoch: value} for a metric across EVERY run in the file store."""
    out = {}
    for path in glob.glob(
        str(work / "mlruns" / "*" / "*" / "metrics" / metric)
    ):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    ts, val, step = parts[0], float(parts[1]), int(parts[2])
                    out.setdefault(step, []).append(val)
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--preempt-epoch", type=int, default=40)
    p.add_argument("--grid", type=int, default=9)
    p.add_argument("--asc-size", type=int, default=250)
    p.add_argument("--workdir", default="/tmp/soak_r5")
    p.add_argument("--timeout", type=float, default=7200.0)
    args = p.parse_args()

    work = Path(args.workdir)
    build_workspace(work, args.grid, args.asc_size, args.epochs)
    env = dict(os.environ)
    # PREPEND the repo: replacing PYTHONPATH would drop entries the
    # platform needs (e.g. the dir whose sitecustomize registers the
    # JAX PJRT plugin named in JAX_PLATFORMS).
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    env["EXPERIMENT_MODE"] = "true"

    rc1, wall1 = run_until_epoch(
        work, env, args.preempt_epoch, args.timeout
    )
    preempted_saved = (work / "ckpts" / "preempted.pth").exists()
    print(f"run 1: exit {rc1} after {wall1:.0f}s, "
          f"preempted.pth={'yes' if preempted_saved else 'NO'}",
          flush=True)

    t0 = time.time()
    with open(work / "soak_run2.log", "w") as logf:
        rc2 = subprocess.call(
            [sys.executable, "-m", "terra_gan_tpu.cli.main_pipeline",
             "--mode", "train", "--config", "config.yaml"],
            cwd=work, env=env, stdout=logf, stderr=subprocess.STDOUT,
            timeout=args.timeout,
        )
    wall2 = time.time() - t0
    print(f"run 2: exit {rc2} after {wall2:.0f}s", flush=True)

    # ---- verification ------------------------------------------------
    g = epoch_series(work, "epoch.g_loss")
    val = epoch_series(work, "validation.g_loss")
    epochs_logged = sorted(g)
    dupes = [e for e, v in g.items() if len(v) > 1]
    # reference epoch numbering is 0-based (train.py:159)
    continuity = (
        epochs_logged == list(range(args.epochs)) and not dupes
    )

    import torch

    master = torch.load(
        work / "ckpts" / "master_checkpoint.pth", map_location="cpu",
        weights_only=False,
    )
    # earliest epoch achieving the global min — what the loop's strict
    # `val_g < best_val` keeps chronologically (each epoch appears once
    # when continuity holds)
    val_best = None
    if val:
        mv = min(v[0] for v in val.values())
        val_best = min(e for e in val if val[e][0] == mv)
    # chronologically-last best_model_validation write across both runs
    best_writes = []
    for path in glob.glob(
        str(work / "mlruns" / "*" / "*" / "metrics"
            / "model.best_model_validation.epoch")
    ):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    best_writes.append((int(parts[0]), float(parts[1])))
    tracked_best = int(max(best_writes)[1]) if best_writes else None
    # reference contract: the final master holds the FINAL epoch's
    # state (main_pipeline.py:386-412); the best-val weights are the
    # tracker's best_model_validation artifact
    best_ok = (
        val_best is not None
        and tracked_best == val_best
        and master.get("epoch") == args.epochs - 1
    )

    sys.path.insert(0, str(REPO))
    from terra_gan_tpu.analysis.runs import load_runs

    runs = load_runs(work / "mlruns")
    result = {
        "exit_codes": [rc1, rc2],
        "preempted_pth_saved": preempted_saved,
        "preempted_pth_consumed": not (
            work / "ckpts" / "preempted.pth"
        ).exists(),
        "epochs_logged": len(epochs_logged),
        "duplicate_epochs": dupes,
        "loss_curve_continuous": continuity,
        "master_epoch": master.get("epoch"),
        "tracked_best_epoch": tracked_best,
        "val_argmin_epoch": val_best,
        "best_model_semantics_ok": best_ok,
        "mlruns_loaded_runs": len(runs),
        "wall_s": round(wall1 + wall2, 1),
        "ok": (
            rc1 == 75 and rc2 == 0 and preempted_saved and continuity
            and best_ok and len(runs) >= 2
        ),
    }
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
