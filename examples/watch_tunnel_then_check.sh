#!/usr/bin/env bash
# Poll the TPU tunnel; when a trivial dispatch succeeds, run the queued
# on-chip A/Bs (examples/run_onchip_checks.sh) once and exit.
# Probe uses a hard timeout because a down tunnel blocks forever in C.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/onchip_checks.log}"
PROBE='
from voiceactivityprojection_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 128)).sum()))
'
echo "[watch] logging to $LOG" >&2
for i in $(seq 1 200); do
  if timeout 240 python -c "$PROBE" >/dev/null 2>&1; then
    echo "[watch] tunnel up after $i probes; running on-chip checks" | tee -a "$LOG" >&2
    bash examples/run_onchip_checks.sh >>"$LOG" 2>&1
    echo "[watch] on-chip checks done (exit $?)" | tee -a "$LOG" >&2
    exit 0
  fi
  echo "[watch] probe $i failed ($(date +%H:%M)); sleeping 120s" >>"$LOG"
  sleep 120
done
echo "[watch] gave up after 200 probes" | tee -a "$LOG" >&2
exit 1
