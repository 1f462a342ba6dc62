#!/usr/bin/env bash
# One-shot tracked training launcher (reference: log_run.sh).
set -euo pipefail
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
"$SCRIPT_DIR/run_pipeline.sh" train "$@"
