#!/usr/bin/env bash
# Reset the tracking store with a timestamped backup
# (reference: reset_mlflow.sh — backup + recreate mlruns).
set -euo pipefail

STORE="${TRACKING_STORE:-./mlruns}"
PID_FILE="${PID_FILE:-.tracking_server.pid}"

if [[ -f "$PID_FILE" ]]; then
  kill "$(cat "$PID_FILE")" 2>/dev/null || true
  rm -f "$PID_FILE"
fi

if [[ -d "$STORE" ]]; then
  BACKUP="${STORE%/}_backup_$(date +%Y%m%d_%H%M%S)"
  mv "$STORE" "$BACKUP"
  echo "backed up existing store to $BACKUP"
fi
mkdir -p "$STORE"
echo "tracking store reset at $STORE"
