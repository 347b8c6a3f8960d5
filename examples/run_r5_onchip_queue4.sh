#!/usr/bin/env bash
# Round-5 queue 4: churn-soak A/B with the packed single-fetch tick
# (runs after queue3 so the chip is free).
set -u
cd "$(dirname "$0")/.."
echo "$(date -u +%H:%M:%S) queue4 waiting for queue3..."
until grep -q "queue3 drained" /tmp/r5q3_driver.log 2>/dev/null; do sleep 120; done
if [ ! -f /tmp/r5q_soak_churn2.log ]; then
  echo "$(date -u +%H:%M:%S) churn soak (packed fetch)"
  timeout 1800 python examples/soak_churn.py --streams 64 --duration 600 \
    --out /tmp/soak_churn_r5b.json > /tmp/r5q_soak_churn2.log 2>&1
  echo "rc=$?" >> /tmp/r5q_soak_churn2.log
fi
echo "$(date -u +%H:%M:%S) queue4 drained"
