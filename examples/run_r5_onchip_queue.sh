#!/usr/bin/env bash
# Round-5 on-chip work queue (VERDICT r4 items). Sequential, artifact-
# guarded (re-run safe), tunnel-wait prologue. Logs -> /tmp/r5q_*.log.
#
# Jobs (VERDICT r4 item in parens):
#   1. CPC pretraining to convergence on the pseudo-dialog corpus (item 1)
#   2. arm A: pretrained + frozen encoder   (item 1)
#   3. arm B: random     + frozen encoder   (item 1)
#   4. arm C: random     + unfrozen encoder (item 1, r4 recipe control)
#   5. unfrozen train-step --deep decomposition (item 4; gated on marker)
#   6. serving churn soak (item 3; gated on examples/soak_churn.py)
#   7. F0-cue-isolated corpus training x3 seeds (item 2; gated on corpus)
#   8. bench.py (merged line; prewarms the driver's end-of-round run)
set -u
cd "$(dirname "$0")/.."

CORPUS=/tmp/phrases_dialog_r5

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

# 0. corpus must exist (generated on CPU by the session)
if [ ! -f "$CORPUS/train.csv" ]; then
  VAP_PLATFORM=cpu timeout 900 python examples/make_phrases_dialog_corpus.py \
    --out "$CORPUS" --n_train 200 --n_val 24 --duration 24 --seed 0 \
    > /tmp/r5q_corpus.log 2>&1
fi

# 1. CPC pretraining to convergence (19.2 ms/step -> 40k steps ~15-40 min)
if [ ! -f /tmp/cpc_r5/DONE ]; then
  echo "$(date -u +%H:%M:%S) [1/8] CPC pretraining 40k steps"
  timeout 7200 python pretrain_cpc.py \
    --data_train_path "$CORPUS/train.csv" \
    --steps 40000 --batch_size 32 --log_every 200 --save_every 5000 \
    --out_dir /tmp/cpc_r5 --seed 0 > /tmp/r5q_cpc.log 2>&1
  rc=$?
  echo "rc=$rc" >> /tmp/r5q_cpc.log
  [ $rc -eq 0 ] && touch /tmp/cpc_r5/DONE
fi

train_arm() {  # $1=out_dir $2=freeze $3=extra-args...
  local out="$1" freeze="$2"; shift 2
  timeout 7200 python train.py \
    --data_train_path "$CORPUS/train.csv" \
    --data_val_path "$CORPUS/val.csv" \
    --vap_freeze_encoder "$freeze" --data_augment_probability 0 \
    --vap_dtype bfloat16 --max_epochs 40 --seed 0 \
    --out_dir "$out" "$@"
}

# 2. arm A: pretrained + frozen
if [ ! -d /tmp/runs_arm_pf ] && [ -f /tmp/cpc_r5/DONE ]; then
  echo "$(date -u +%H:%M:%S) [2/8] arm A pretrained+frozen"
  train_arm /tmp/runs_arm_pf 1 --init_encoder_from /tmp/cpc_r5/cpc_encoder \
    > /tmp/r5q_arm_pf.log 2>&1
  echo "rc=$?" >> /tmp/r5q_arm_pf.log
fi

# 3. arm B: random + frozen
if [ ! -d /tmp/runs_arm_rf ]; then
  echo "$(date -u +%H:%M:%S) [3/8] arm B random+frozen"
  train_arm /tmp/runs_arm_rf 1 > /tmp/r5q_arm_rf.log 2>&1
  echo "rc=$?" >> /tmp/r5q_arm_rf.log
fi

# 4. arm C: random + unfrozen (r4 recipe control; r4 best val 2.073)
if [ ! -d /tmp/runs_arm_ru ]; then
  echo "$(date -u +%H:%M:%S) [4/8] arm C random+unfrozen"
  train_arm /tmp/runs_arm_ru 0 > /tmp/r5q_arm_ru.log 2>&1
  echo "rc=$?" >> /tmp/r5q_arm_ru.log
fi

# 5. unfrozen train-step decomposition (needs the --unfrozen mode landed)
if [ -f examples/.r5_unfrozen_ready ] && [ ! -f /tmp/r5q_profile_unfrozen.log ]; then
  echo "$(date -u +%H:%M:%S) [5/8] profile_train_step --unfrozen --deep"
  timeout 3600 python examples/profile_train_step.py 16 --deep --unfrozen \
    > /tmp/r5q_profile_unfrozen.log 2>&1
  echo "rc=$?" >> /tmp/r5q_profile_unfrozen.log
fi

# 6. serving churn soak (lands mid-round)
if [ -f examples/soak_churn.py ] && [ ! -f /tmp/r5q_soak_churn.log ]; then
  echo "$(date -u +%H:%M:%S) [6/8] churn soak"
  timeout 3600 python examples/soak_churn.py --streams 64 --duration 600 \
    --out /tmp/soak_churn_r5.json > /tmp/r5q_soak_churn.log 2>&1
  echo "rc=$?" >> /tmp/r5q_soak_churn.log
fi

# 7. F0-cue-isolated corpus: 3 seeds train + directionality (lands mid-round)
if [ -f /tmp/phrases_isolated/train.csv ]; then
  for seed in 0 1 2; do
    if [ ! -d "/tmp/runs_iso_s$seed" ]; then
      echo "$(date -u +%H:%M:%S) [7/8] isolated-corpus training seed $seed"
      timeout 7200 python train.py \
        --data_train_path /tmp/phrases_isolated/train.csv \
        --data_val_path /tmp/phrases_isolated/val.csv \
        --vap_freeze_encoder 0 --data_augment_probability 0 \
        --vap_dtype bfloat16 --max_epochs 40 --seed "$seed" \
        --out_dir "/tmp/runs_iso_s$seed" > "/tmp/r5q_iso_s$seed.log" 2>&1
      echo "rc=$?" >> "/tmp/r5q_iso_s$seed.log"
    fi
  done
fi

# 8. bench (merged line; also prewarms XLA cache for the driver run)
if [ ! -f /tmp/r5q_bench.log ]; then
  echo "$(date -u +%H:%M:%S) [8/8] bench.py"
  timeout 3600 python bench.py > /tmp/r5q_bench.log 2>&1
  echo "rc=$?" >> /tmp/r5q_bench.log
fi

echo "$(date -u +%H:%M:%S) queue drained"
