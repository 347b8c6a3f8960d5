#!/usr/bin/env bash
# Round-5 queue 5: churn soaks with the shared-context client + packed
# tick fetch. Two runs:
#   a) correctness soak — pace 5x (200 ms/hop > the ~100-130 ms tunneled
#      tick, so sessions stay underrun-free and the solo-replay
#      contamination check has candidates). On a locally-attached host
#      the same tick runs ~10 ms and pace 1 would hold.
#   b) stress soak — live pacing (40 ms hops), sessions saturate the
#      tick rate; measures honest tunneled latency + underrun behavior;
#      no contamination candidates expected (check disabled).
set -u
cd "$(dirname "$0")/.."

if [ ! -f /tmp/r5q_soak_correct.log ]; then
  echo "$(date -u +%H:%M:%S) [a] correctness soak (pace 5)"
  timeout 2400 python -u examples/soak_churn.py --streams 64 \
    --duration 600 --pace 5.0 --max_wait_ms 400 --check_sessions 16 \
    --port 5614 \
    --out /tmp/soak_churn_r5_correct.json > /tmp/r5q_soak_correct.log 2>&1
  echo "rc=$?" >> /tmp/r5q_soak_correct.log
fi

if [ ! -f /tmp/r5q_soak_stress.log ]; then
  echo "$(date -u +%H:%M:%S) [b] stress soak (live pacing)"
  timeout 1800 python -u examples/soak_churn.py --streams 64 \
    --duration 300 --pace 1.0 --check_sessions 0 --port 5615 \
    --out /tmp/soak_churn_r5_stress.json > /tmp/r5q_soak_stress.log 2>&1
  echo "rc=$?" >> /tmp/r5q_soak_stress.log
fi
echo "$(date -u +%H:%M:%S) queue5 drained"
