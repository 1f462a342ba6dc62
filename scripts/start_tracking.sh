#!/usr/bin/env bash
# Tracking server lifecycle (reference: start_mlflow.sh).
# Starts an MLflow UI server over the tracking store when mlflow is
# installed; the tracker's zero-dep JSONL file store needs no server
# (analysis tools read it directly: python -m terra_gan_tpu.analysis.*).
set -euo pipefail

PORT="${MLFLOW_PORT:-5000}"
STORE="${TRACKING_STORE:-./mlruns}"
PID_FILE="${PID_FILE:-.tracking_server.pid}"

if python -c "import mlflow" 2>/dev/null; then
  echo "starting mlflow server on 0.0.0.0:$PORT (store: $STORE)"
  mlflow server \
    --host 0.0.0.0 --port "$PORT" \
    --backend-store-uri "file:$STORE" \
    --workers 4 &
  echo $! > "$PID_FILE"
  echo "pid $(cat "$PID_FILE")"
else
  echo "mlflow is not installed; the tracker writes a JSONL file store at $STORE."
  echo "Inspect runs with:"
  echo "  python -m terra_gan_tpu.analysis.compare --store $STORE"
  echo "  python -m terra_gan_tpu.analysis.visualize --store $STORE --summary"
fi
