#!/usr/bin/env bash
# Move all local files of a grid square into _to_delete_ for review
# (reference: cleanup_grid.sh — non-destructive cleanup).
set -euo pipefail

GRID="${1:-}"
[[ -z "$GRID" ]] && { echo "usage: $0 <GRID>" >&2; exit 2; }
CONFIG="${CONFIG:-config.yaml}"
DEST="_to_delete_/$(date +%Y%m%d_%H%M%S)_$GRID"
mkdir -p "$DEST"

python - <<PY
import shutil
from pathlib import Path
from terra_gan_tpu.config import Config

cfg = Config.load("$CONFIG") if Path("$CONFIG").exists() else Config()
dest = Path("$DEST")
moved = 0
for root in (cfg.data.processed_dir, cfg.data.output_dir):
    src = Path(root) / "$GRID"
    if src.exists():
        shutil.move(str(src), str(dest / src.parent.name))
        moved += 1
print(f"moved {moved} trees for $GRID into {dest}")
PY
