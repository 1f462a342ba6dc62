#!/usr/bin/env bash
# Remote portal-host cleanup wrapper (reference: cleanup_pythonanywhere.sh).
set -euo pipefail
: "${PA_USERNAME:?set PA_USERNAME}"
: "${PA_TOKEN:?set PA_TOKEN}"
: "${PA_REMOTE_DIR:?set PA_REMOTE_DIR}"
python -m terra_gan_tpu.portal.pythonanywhere cleanup \
  --username "$PA_USERNAME" --token "$PA_TOKEN" \
  --remote-dir "$PA_REMOTE_DIR" ${1:+--grid "$1"}
