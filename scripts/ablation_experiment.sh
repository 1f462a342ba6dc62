#!/usr/bin/env bash
# Ablation study automation (reference: ablation_experiment.sh) —
# the run_experiment.sh flow WITHOUT the annotation/human-guided
# stages: per-grid train -> evaluate, then held-out evaluation.
set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(dirname "$SCRIPT_DIR")"
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"
export EXPERIMENT_MODE=true

FINAL_GRID="${FINAL_GRID:-NS83}"
CONFIG="${CONFIG:-config.yaml}"
if [[ -z "${EXPERIMENT_NAME:-}" ]]; then
  read -r -p "Ablation experiment name: " EXPERIMENT_NAME
fi
mkdir -p logs "experiments/$EXPERIMENT_NAME"

GRIDS="$(python - <<PY
from pathlib import Path
from terra_gan_tpu.config import Config
cfg = Config.load("$CONFIG") if Path("$CONFIG").exists() else Config()
for z in sorted(Path(cfg.data.input_zip_folder).glob("*.zip")):
    print(z.stem.upper())
PY
)"
[[ -z "$GRIDS" ]] && { echo "no input zips found" >&2; exit 1; }

for GRID in $GRIDS; do
  echo "=== grid $GRID: train ==="
  "$SCRIPT_DIR/run_pipeline.sh" train --config "$CONFIG"
  echo "=== grid $GRID: evaluate ==="
  "$SCRIPT_DIR/run_pipeline.sh" evaluate --grid "$GRID" --config "$CONFIG"
done

echo "=== final held-out evaluation on $FINAL_GRID ==="
python -m terra_gan_tpu.data.final_eval --grid "$FINAL_GRID" --config "$CONFIG"
"$SCRIPT_DIR/run_pipeline.sh" evaluate --grid "$FINAL_GRID" --config "$CONFIG"
echo "ablation $EXPERIMENT_NAME complete"
