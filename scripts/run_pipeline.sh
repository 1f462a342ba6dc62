#!/usr/bin/env bash
# Mode runner (reference: run_pipeline.sh) — CLI facade over the
# pipeline driver with the same mode names and options.
#
# Usage: run_pipeline.sh <train|evaluate|human_guided|human_guided_train|all>
#            [--model PATH] [--grid GRID] [--debug] [--no-tracking]
set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(dirname "$SCRIPT_DIR")"
cd "${PIPELINE_ROOT:-$PWD}"
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"

MODE="${1:-}"
shift || true
[[ -z "$MODE" ]] && { echo "usage: $0 <mode> [options]" >&2; exit 2; }

# reference maps human_guided -> human_guided_train (run_pipeline.sh:50-53)
[[ "$MODE" == "human_guided" ]] && MODE="human_guided_train"

ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --model)       ARGS+=(--input_model "$2"); shift 2 ;;
    --grid)        ARGS+=(--grid "$2"); shift 2 ;;
    --debug)       ARGS+=(--debug); shift ;;
    --no-tracking|--no-mlflow) ARGS+=(--no-tracking); shift ;;
    --config)      ARGS+=(--config "$2"); shift 2 ;;
    *) echo "unknown option: $1" >&2; exit 2 ;;
  esac
done

mkdir -p logs
TS="$(date +%Y%m%d_%H%M%S)"

run_mode() {
  local mode="$1"
  echo ">>> running mode: $mode"
  python -m terra_gan_tpu.cli.main_pipeline --mode "$mode" "${ARGS[@]}" \
    2>&1 | tee "logs/pipeline_${mode}_${TS}.log"
  return "${PIPESTATUS[0]}"
}

if [[ "$MODE" == "all" ]]; then
  for m in train evaluate human_guided_train; do
    run_mode "$m" || { echo "mode $m failed" >&2; exit 1; }
  done
else
  run_mode "$MODE"
fi
