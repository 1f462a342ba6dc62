#!/usr/bin/env bash
# Full human-study experiment automation (reference: run_experiment.sh).
#
# Per parent grid: train -> evaluate -> upload colored tiles -> BLOCK
# until human annotations are complete on the portal (polling, with a
# configurable timeout; reference waits up to 48h, run_experiment.sh:20)
# -> human-guided fine-tune -> portal cleanup. Afterwards: held-out
# grid (default NS83) evaluation + terrain deception metrics.
set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(dirname "$SCRIPT_DIR")"
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"
export EXPERIMENT_MODE=true

ANNOTATION_TIMEOUT_H="${ANNOTATION_TIMEOUT_H:-48}"
POLL_INTERVAL_S="${POLL_INTERVAL_S:-300}"
FINAL_GRID="${FINAL_GRID:-NS83}"
CONFIG="${CONFIG:-config.yaml}"

if [[ -z "${EXPERIMENT_NAME:-}" ]]; then
  read -r -p "Experiment name: " EXPERIMENT_NAME
fi
echo "=== experiment: $EXPERIMENT_NAME ==="
mkdir -p logs experiments/"$EXPERIMENT_NAME"

snapshot_model() {
  local tag="$1"
  local ckpt
  ckpt="$(python - <<PY
from terra_gan_tpu.config import Config
from pathlib import Path
cfg = Config.load("$CONFIG") if Path("$CONFIG").exists() else Config()
print(Path(cfg.evaluation.checkpoint_dir) / "master_checkpoint.pth")
PY
)"
  if [[ -f "$ckpt" ]]; then
    cp "$ckpt" "experiments/$EXPERIMENT_NAME/model_${tag}.pth"
  fi
}

wait_for_annotations() {
  local grid="$1"
  local deadline=$(( $(date +%s) + ANNOTATION_TIMEOUT_H * 3600 ))
  echo "waiting for annotations on $grid (timeout ${ANNOTATION_TIMEOUT_H}h)..."
  while (( $(date +%s) < deadline )); do
    if python - <<PY
import sys
from pathlib import Path
from terra_gan_tpu.config import Config
from terra_gan_tpu.portal import PortalClient
cfg = Config.load("$CONFIG") if Path("$CONFIG").exists() else Config()
client = PortalClient(cfg.portal.base_url, cfg.portal.api_key)
status = client.get_annotation_status("$grid") or {}
sys.exit(0 if status.get("completed") else 1)
PY
    then
      echo "annotations complete for $grid"
      return 0
    fi
    sleep "$POLL_INTERVAL_S"
  done
  echo "annotation wait timed out for $grid" >&2
  return 1
}

# ---- per-grid loop over input zips ----------------------------------------
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
  snapshot_model "after_train_${GRID}"

  echo "=== grid $GRID: evaluate ==="
  "$SCRIPT_DIR/run_pipeline.sh" evaluate --grid "$GRID" --config "$CONFIG"

  echo "=== grid $GRID: upload ==="
  python -m terra_gan_tpu.portal.upload_results --grid "$GRID" --config "$CONFIG" || {
    echo "upload failed; skipping human-guided stage for $GRID" >&2
    continue
  }

  if wait_for_annotations "$GRID"; then
    echo "=== grid $GRID: human-guided train ==="
    "$SCRIPT_DIR/run_pipeline.sh" human_guided_train --grid "$GRID" --config "$CONFIG"
    snapshot_model "after_hg_${GRID}"
  fi
done

# ---- final held-out evaluation ---------------------------------------------
echo "=== final held-out evaluation on $FINAL_GRID ==="
python -m terra_gan_tpu.data.final_eval --grid "$FINAL_GRID" --config "$CONFIG"
"$SCRIPT_DIR/run_pipeline.sh" evaluate --grid "$FINAL_GRID" --config "$CONFIG"

OUT_DIR="experiments/$EXPERIMENT_NAME"
python -m terra_gan_tpu.evaluation.terrain \
  --original-masks "$(python - <<PY
from pathlib import Path
from terra_gan_tpu.config import Config
cfg = Config.load("$CONFIG") if Path("$CONFIG").exists() else Config()
print(Path(cfg.data.processed_dir) / "$FINAL_GRID" / "test" / "masks")
PY
)" \
  --final-annotations "$(python - <<PY
from pathlib import Path
from terra_gan_tpu.config import Config
cfg = Config.load("$CONFIG") if Path("$CONFIG").exists() else Config()
print(Path(cfg.data.output_dir) / "$FINAL_GRID" / "human_annotation_masks")
PY
)" \
  --output-file "$OUT_DIR/terrain_metrics.json" || true

echo "experiment $EXPERIMENT_NAME complete; artifacts in $OUT_DIR"
