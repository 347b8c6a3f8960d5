#!/usr/bin/env bash
# Round-3 on-chip work queue: waits for the axon tunnel, then drains the
# remaining measurement/training jobs sequentially. Each job is wrapped in
# `timeout`; logs land in /tmp/r3q_*.log. Safe to re-run — jobs that
# already produced their artifact are skipped.
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

# 1. freeze-fix validation training (12 epochs on the 400x60s corpus)
if [ ! -d /tmp/runs_freezefix ] && [ -f /tmp/corpus400/train.csv ]; then
  echo "$(date -u +%H:%M:%S) [1/4] freeze-fix training"
  timeout 3600 python train.py \
    --data_train_path /tmp/corpus400/train.csv \
    --data_val_path /tmp/corpus400/val.csv \
    --max_epochs 12 --out_dir /tmp/runs_freezefix --seed 0 \
    > /tmp/r3q_freezefix.log 2>&1
  echo "rc=$?" >> /tmp/r3q_freezefix.log
fi

# 2. train-step decomposition
if [ ! -f /tmp/r3q_profile_train.log ]; then
  echo "$(date -u +%H:%M:%S) [2/4] train-step profile"
  timeout 2400 python examples/profile_train_step.py 16 \
    > /tmp/r3q_profile_train.log 2>&1
  echo "rc=$?" >> /tmp/r3q_profile_train.log
fi

# 3. CPC pretraining on the phrases corpus -> frozen-encoder phrases train
if [ ! -d /tmp/cpc_phrases ] && [ -f /tmp/phrases_dialog/train.csv ]; then
  echo "$(date -u +%H:%M:%S) [3/4] CPC pretrain + frozen phrases train"
  timeout 3600 python pretrain_cpc.py \
    --data_train_path /tmp/phrases_dialog/train.csv \
    --steps 5000 --out_dir /tmp/cpc_phrases --seed 0 \
    > /tmp/r3q_cpc.log 2>&1
  echo "rc=$?" >> /tmp/r3q_cpc.log
  CKPT=/tmp/cpc_phrases/cpc_encoder
  if [ -d "$CKPT" ]; then
    timeout 3600 python train.py \
      --data_train_path /tmp/phrases_dialog/train.csv \
      --data_val_path /tmp/phrases_dialog/val.csv \
      --vap_dtype bfloat16 --data_augment_probability 0 \
      --init_encoder_from "$CKPT" \
      --max_epochs 100 --out_dir /tmp/runs_phrases_frozen --seed 0 \
      > /tmp/r3q_phrases_frozen.log 2>&1
    echo "rc=$?" >> /tmp/r3q_phrases_frozen.log
  fi
fi

# 4. fresh bench record
echo "$(date -u +%H:%M:%S) [4/4] bench"
VAP_BENCH_PROBE_BUDGET=1800 timeout 2400 python bench.py \
  > /tmp/r3q_bench.log 2>&1
echo "rc=$?" >> /tmp/r3q_bench.log
echo "$(date -u +%H:%M:%S) queue drained"
