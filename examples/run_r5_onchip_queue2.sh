#!/usr/bin/env bash
# Round-5 on-chip queue, part 2: waits for queue1 to drain (its final
# artifact is /tmp/r5q_bench.log), then runs the isolated-corpus probe
# evaluations (VERDICT r4 item 2's measurement half).
#
#   per seed 0..2: evaluate_phrases (6 permutations; only_f0 dropped —
#                  it is an information-removal control, not a signed
#                  probe) + directionality full & held-out
# Artifacts -> analyzes/results_phrases_r5/.
set -u
cd "$(dirname "$0")/.."

echo "$(date -u +%H:%M:%S) queue2 waiting for queue1 (r5q_bench.log)..."
until [ -f /tmp/r5q_bench.log ]; do sleep 120; done
echo "$(date -u +%H:%M:%S) queue1 drained; starting isolated-corpus evals"

PERMS="regular flat_f0 flat_intensity duration_avg shift_f0_up shift_f0_down"
mkdir -p analyzes/results_phrases_r5

for seed in 0 1 2; do
  CKPT=$(ls -d /tmp/runs_iso_s$seed/*/ckpt_best 2>/dev/null | head -1)
  if [ -z "${CKPT:-}" ]; then
    echo "seed $seed: no checkpoint; skipping"
    continue
  fi
  if [ ! -f /tmp/phrases_eval_iso_s$seed/phrases_scores.csv ]; then
    echo "$(date -u +%H:%M:%S) evaluate_phrases seed $seed"
    timeout 10800 python evaluate_phrases.py \
      --checkpoint "$CKPT" --out_dir /tmp/phrases_eval_iso_s$seed \
      --permutations $PERMS > /tmp/r5q_evalphrases_s$seed.log 2>&1
    echo "rc=$?" >> /tmp/r5q_evalphrases_s$seed.log
  fi
  if [ -f /tmp/phrases_eval_iso_s$seed/phrases_scores.csv ]; then
    VAP_PLATFORM=cpu timeout 900 python analyzes/phrases_directionality.py \
      --scores /tmp/phrases_eval_iso_s$seed/phrases_scores.csv \
      --out analyzes/results_phrases_r5/directionality_iso_s$seed.json \
      > /tmp/r5q_dir_iso_s$seed.log 2>&1
    VAP_PLATFORM=cpu timeout 900 python analyzes/phrases_directionality.py \
      --scores /tmp/phrases_eval_iso_s$seed/phrases_scores.csv \
      --voices heldout \
      --out analyzes/results_phrases_r5/directionality_iso_s${seed}_heldout.json \
      > /tmp/r5q_dir_iso_s${seed}_ho.log 2>&1
    gzip -c /tmp/phrases_eval_iso_s$seed/phrases_scores.csv \
      > analyzes/results_phrases_r5/phrases_scores_iso_s$seed.csv.gz
    cp /tmp/phrases_eval_iso_s$seed/phrases_aggregate.json \
      analyzes/results_phrases_r5/phrases_aggregate_iso_s$seed.json \
      2>/dev/null || true
  fi
done
echo "$(date -u +%H:%M:%S) queue2 drained"
