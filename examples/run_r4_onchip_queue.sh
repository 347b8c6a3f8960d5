#!/usr/bin/env bash
# Round-4 on-chip work queue: waits for the axon tunnel, then drains the
# measurement/training jobs sequentially. Each job is wrapped in `timeout`;
# logs land in /tmp/r4q_*.log. Safe to re-run — jobs that already produced
# their artifact are skipped.
#
# Jobs (VERDICT r3 items in parens):
#   1. bench.py            — merged inference+train line (item 4) + XLA-cache
#                            prewarm for the driver's end-of-round run
#   2. profile_train_step  — B=16 and B=32 level-2 backward decomposition
#                            (item 1, the top-leverage ask)
#   3. mono                — synthetic corpus -> train.py --mono with
#                            va_history on-chip + bench.py --mono (item 5)
#   4. phrases r4          — retrain on the round-4 overlap-rich pseudo-
#                            dialog corpus (item 6)
#   5. evaluate_phrases    — 360 wavs x 7 permutations with the r4 ckpt
#   6. directionality      — paired analysis (all + heldout voices) ->
#                            analyzes/results_phrases_r4/
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python - <<'EOF' > /dev/null 2>&1
from voiceactivityprojection_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp
float(jnp.ones((8, 128)).sum())
EOF
}

echo "$(date -u +%H:%M:%S) waiting for tunnel..."
until probe; do sleep 120; done
echo "$(date -u +%H:%M:%S) tunnel up; draining queue"

# 1. bench sanity (merged line) + cache prewarm
if [ ! -f /tmp/r4q_bench.log ]; then
  echo "$(date -u +%H:%M:%S) [1/6] bench.py (merged line)"
  timeout 3600 python bench.py > /tmp/r4q_bench.log 2>&1
  echo "rc=$?" >> /tmp/r4q_bench.log
fi

# 1b. flash backward A/B: fused single-block kernel vs split pair
if [ ! -f /tmp/r4q_flashbwd.log ]; then
  echo "$(date -u +%H:%M:%S) [1b/6] flash backward A/B"
  timeout 2400 python examples/bench_flash_bwd.py > /tmp/r4q_flashbwd.log 2>&1
  echo "rc=$?" >> /tmp/r4q_flashbwd.log
fi

# 2. train-step level-2 decomposition at B=16 and B=32
if [ ! -f /tmp/r4q_profile16.log ]; then
  echo "$(date -u +%H:%M:%S) [2/6] profile_train_step 16 --deep"
  timeout 3000 python examples/profile_train_step.py 16 --deep \
    > /tmp/r4q_profile16.log 2>&1
  echo "rc=$?" >> /tmp/r4q_profile16.log
fi
if [ ! -f /tmp/r4q_profile32.log ]; then
  echo "$(date -u +%H:%M:%S) [2/6] profile_train_step 32 --deep"
  timeout 3000 python examples/profile_train_step.py 32 --deep \
    > /tmp/r4q_profile32.log 2>&1
  echo "rc=$?" >> /tmp/r4q_profile32.log
fi

# 3. mono on hardware: training run (va_history live) + forward bench
if [ ! -f /tmp/corpus_mono/train.csv ]; then
  VAP_PLATFORM=cpu timeout 900 python examples/make_synthetic_corpus.py \
    --out /tmp/corpus_mono --n 40 --duration 60 > /tmp/r4q_monocorpus.log 2>&1
fi
if [ ! -d /tmp/runs_mono_r4 ] && [ -f /tmp/corpus_mono/train.csv ]; then
  echo "$(date -u +%H:%M:%S) [3/6] mono training (va_history on)"
  timeout 3600 python train.py --mono \
    --data_train_path /tmp/corpus_mono/train.csv \
    --data_val_path /tmp/corpus_mono/val.csv \
    --vap_dtype bfloat16 --vap_va_history 1 --data_flip_channels 0 \
    --data_phrases_probe 0 \
    --max_epochs 6 --out_dir /tmp/runs_mono_r4 --seed 0 \
    > /tmp/r4q_mono_train.log 2>&1
  echo "rc=$?" >> /tmp/r4q_mono_train.log
fi
if [ ! -f /tmp/r4q_mono_bench.log ]; then
  echo "$(date -u +%H:%M:%S) [3/6] mono bench"
  timeout 2400 python bench.py --mono > /tmp/r4q_mono_bench.log 2>&1
  echo "rc=$?" >> /tmp/r4q_mono_bench.log
fi

# 4. phrases round-4 training (overlap-rich corpus; probe logs val_ps_*)
if [ ! -d /tmp/runs_phrases_r4 ] && [ -f /tmp/phrases_dialog_r4/train.csv ]; then
  echo "$(date -u +%H:%M:%S) [4/6] phrases r4 training"
  timeout 5400 python train.py \
    --data_train_path /tmp/phrases_dialog_r4/train.csv \
    --data_val_path /tmp/phrases_dialog_r4/val.csv \
    --vap_freeze_encoder 0 --data_augment_probability 0 \
    --vap_dtype bfloat16 \
    --max_epochs 40 --out_dir /tmp/runs_phrases_r4 --seed 0 \
    > /tmp/r4q_phrases_train.log 2>&1
  echo "rc=$?" >> /tmp/r4q_phrases_train.log
fi

# 5. full-corpus prosody permutation evaluation with the r4 checkpoint
CKPT=$(ls -d /tmp/runs_phrases_r4/*/ckpt_best 2>/dev/null | head -1)
if [ ! -f /tmp/phrases_eval_r4/phrases_scores.csv ] && [ -n "${CKPT:-}" ]; then
  echo "$(date -u +%H:%M:%S) [5/6] evaluate_phrases (360 x 7)"
  timeout 10800 python evaluate_phrases.py \
    --checkpoint "$CKPT" --out_dir /tmp/phrases_eval_r4 \
    > /tmp/r4q_evalphrases.log 2>&1
  echo "rc=$?" >> /tmp/r4q_evalphrases.log
fi

# 6. directionality (all + heldout) -> repo artifacts
if [ -f /tmp/phrases_eval_r4/phrases_scores.csv ]; then
  echo "$(date -u +%H:%M:%S) [6/6] directionality"
  mkdir -p analyzes/results_phrases_r4
  VAP_PLATFORM=cpu timeout 900 python analyzes/phrases_directionality.py \
    --scores /tmp/phrases_eval_r4/phrases_scores.csv \
    --out analyzes/results_phrases_r4/directionality.json \
    > /tmp/r4q_dir_all.log 2>&1
  VAP_PLATFORM=cpu timeout 900 python analyzes/phrases_directionality.py \
    --scores /tmp/phrases_eval_r4/phrases_scores.csv --voices heldout \
    --out analyzes/results_phrases_r4/directionality_heldout.json \
    > /tmp/r4q_dir_heldout.log 2>&1
  cp /tmp/phrases_eval_r4/phrases_aggregate.json \
    analyzes/results_phrases_r4/phrases_aggregate.json 2>/dev/null || true
  gzip -c /tmp/phrases_eval_r4/phrases_scores.csv \
    > analyzes/results_phrases_r4/phrases_scores.csv.gz
fi

echo "$(date -u +%H:%M:%S) queue drained"
