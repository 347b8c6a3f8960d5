#!/usr/bin/env bash
# Round-5 on-chip queue, part 3 (perf + parity measurements after the
# science queues drain):
#   1. bench_gru_bwd      — Pallas GRU backward vs scan BPTT A/B
#   2. bench --train_unfrozen — unfrozen step with the new GRU backward
#   3. check_trained_parity — arm-C (unfrozen) trained ckpt through the
#                             reference VapGPT on a held-out dialog
#   4. bench.py           — final merged line refresh (+ XLA cache prewarm)
set -u
cd "$(dirname "$0")/.."

echo "$(date -u +%H:%M:%S) queue3 waiting for queue2..."
until grep -q "queue2 drained" /tmp/r5q2_driver.log 2>/dev/null; do sleep 120; done
echo "$(date -u +%H:%M:%S) queue2 drained; starting perf jobs"

if [ ! -f /tmp/r5q_gru_bwd.log ]; then
  echo "$(date -u +%H:%M:%S) [1/4] bench_gru_bwd"
  timeout 3600 python examples/bench_gru_bwd.py 16 > /tmp/r5q_gru_bwd.log 2>&1
  echo "rc=$?" >> /tmp/r5q_gru_bwd.log
fi

if [ ! -f /tmp/r5q_train_unfrozen.log ]; then
  echo "$(date -u +%H:%M:%S) [2/4] bench --train_unfrozen"
  timeout 3600 python bench.py --train_unfrozen 16 > /tmp/r5q_train_unfrozen.log 2>&1
  echo "rc=$?" >> /tmp/r5q_train_unfrozen.log
fi

CKPT=$(ls -d /tmp/runs_arm_ru/*/ckpt_best 2>/dev/null | head -1)
if [ -n "${CKPT:-}" ] && [ ! -f /tmp/r5q_trained_parity.json ]; then
  echo "$(date -u +%H:%M:%S) [3/4] check_trained_parity (CPU)"
  VAP_PLATFORM=cpu timeout 1800 python examples/check_trained_parity.py \
    --checkpoint "$CKPT" --audio /tmp/phrases_dialog_r5/val_0003.wav \
    --out /tmp/r5q_trained_parity.json > /tmp/r5q_trained_parity.log 2>&1
  echo "rc=$?" >> /tmp/r5q_trained_parity.log
fi

if [ ! -f /tmp/r5q_bench_final.log ]; then
  echo "$(date -u +%H:%M:%S) [4/4] bench.py final refresh"
  timeout 3600 python bench.py > /tmp/r5q_bench_final.log 2>&1
  echo "rc=$?" >> /tmp/r5q_bench_final.log
fi

echo "$(date -u +%H:%M:%S) queue3 drained"
