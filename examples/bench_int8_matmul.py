"""Scout the v5e int8 MXU rate at the conv-stack matmul shapes.

The conv stack is the largest stage of the B=64 forward (38 ms of 69.6;
conv1's K=2048 matmul alone ~91% of bf16 peak), so the only lever left
past the bf16 envelope is the int8 MXU: v5e peak is 394 TOPS int8 vs
197 TFLOP/s bf16 (2x). This measures whether XLA actually reaches that
rate at our shapes before any quantized-conv engineering:

  (M, K) x (K, 256) for K in {2048, 1024, 512} (conv1 / conv2-4
  polyphase halves), M = one bench chunk's rows, in bf16 vs
  int8 x int8 -> int32.

Chained dispatch, one host fetch (tunnel-safe). Usage:
    python examples/bench_int8_matmul.py [M]

MEASURED (v5e, M=131072, 2026-08-20) — int8 does NOT pay:

    K=2048  bf16 1.799 ms = 76.4 TF/s | int8 1.446 ms =  95.1 TOPS | 1.24x
    K=1024  bf16 1.452 ms = 47.3 TF/s | int8 1.191 ms =  57.7 TOPS | 1.22x
    K= 512  bf16 1.193 ms = 28.8 TF/s | int8 0.991 ms =  34.7 TOPS | 1.20x

1.2x, not 2x — and 95 TOPS absolute is SLOWER than the fused conv
kernel's VMEM-resident bf16 matmuls (~180 TF/s), so an XLA int8 conv
path would lose to the current default outright. The VMEM-resident
follow-up (bench_int8_pallas.py --vmem) closes the question: the MXU
issues int8 dots at bf16 rate (1.04x) through Mosaic, so the nominal
394-TOPS int8 peak is unreachable via dot_general and W8A8 quantization
of the conv stack would trade accuracy for nothing. See ROADMAP.md
"Perf backlog".
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=30, warmup=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jnp.sum(out[:8, :8].astype(jnp.float32)).block_until_ready()
    float(jnp.sum(out[:8, :8].astype(jnp.float32)))  # hard sync (axon)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[:8, :8].astype(jnp.float32)))
    return (time.time() - t0) / iters


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    rng = np.random.default_rng(0)
    print(f"M={M}  (v5e peaks: bf16 197 TF/s, int8 394 TOPS)")
    for K in (2048, 1024, 512):
        a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), dtype=jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (K, 256)), dtype=jnp.int8)
        ab = a8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)

        @jax.jit
        def mm_bf16(a, w):
            return jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @jax.jit
        def mm_int8(a, w):
            return jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        flops = 2.0 * M * K * 256
        tb = timed(mm_bf16, ab, wb)
        ti = timed(mm_int8, a8, w8)
        print(
            f"K={K:5d}  bf16 {tb * 1e3:7.3f} ms = {flops / tb / 1e12:6.1f} TF/s"
            f"  | int8 {ti * 1e3:7.3f} ms = {flops / ti / 1e12:6.1f} TOPS"
            f"  | speedup {tb / ti:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
