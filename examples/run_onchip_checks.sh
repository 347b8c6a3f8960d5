#!/usr/bin/env bash
# Pending on-chip validations/A-Bs (run when the TPU tunnel is available).
# Each step is independent; everything prints to stdout. The shared
# warmup/chained-timing harness lives in examples/bench_knob.py.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

BK="python examples/bench_knob.py"

echo "== 1. offset flash kernel (context parallelism): numeric + bench =="
timeout 900 python examples/bench_context_attention.py 8000 8

echo "== 2. flash single-block v1 vs v3 (MXU softmax denominator) =="
for impl in v1 v3 v1 v3; do
  VAP_FLASH_SINGLE_IMPL=$impl timeout 900 $BK attn_single --iters 25 --warmup 10
done

echo "== 3. GRU groups A/B (VAP_GRU_GROUPS=1/2/4) =="
for g in 1 2 4 1 2 4; do
  VAP_GRU_GROUPS=$g timeout 900 $BK gru
done

echo "== 4. bench sanity =="
timeout 1200 python bench.py

echo "== 5. GRU+downsample fused epilogue A/B (VAP_GRU_DS; fused is default) =="
for mode in off fused off fused; do
  VAP_GRU_DS=$mode timeout 900 $BK encoder
done

echo "== 5b. combined knobs: VAP_GRU_DS=fused x VAP_GRU_GROUPS=2/4 =="
for g in 2 4; do
  VAP_GRU_DS=fused VAP_GRU_GROUPS=$g timeout 900 $BK encoder
done

echo "== 6. conv T1OUT retune post in-kernel expand =="
for t1 in 1024 2048 1024 2048; do
  VAP_CONV_T1OUT=$t1 timeout 900 $BK conv_stack
done

echo "== 7. streaming hop: KV-cache (1 and 64 streams) vs window recompute =="
for t in kv_hop kv_batch window_hop kv_hop kv_batch window_hop; do
  timeout 900 $BK $t --iters 50 --warmup 20
done
