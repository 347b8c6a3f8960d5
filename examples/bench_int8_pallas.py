"""Probe Mosaic's int8 MXU path: VMEM-resident int8 matmul vs bf16.

bench_int8_matmul.py showed XLA's HBM-streamed int8 dot reaches only
~95 TOPS at the conv shapes (1.2x bf16) — slower in absolute terms than
the fused conv kernel's VMEM-resident bf16 matmuls (~180 TF/s). So int8
only pays if Mosaic lowers int8 x int8 -> int32 dots on the MXU at a
rate approaching the 394 TOPS peak. This measures exactly that: a tiled
matmul (M, K) x (K, N), both operands VMEM-blocked, int8 vs bf16.

Usage: python examples/bench_int8_pallas.py          # HBM-streamed tiles
       python examples/bench_int8_pallas.py --vmem   # VMEM-resident rate

MEASURED (v5e, 2026-08-20) — closes the int8 question NEGATIVELY:

    HBM-streamed  (M=131072, K=2048, N=256):
        bf16 1.805 ms = 76.2 TF/s | int8 1.590 ms = 86.4 TOPS | 1.13x
    VMEM-resident (x16 dots on the same block, HBM amortized):
        int8 94.5 T/s vs bf16 91.1 T/s  ->  issue-rate ratio 1.04x

The MXU runs int8 x int8 -> int32 dots at the SAME issue rate as bf16
through Mosaic/XLA on this chip — the nominal 394-TOPS int8 peak is not
reachable via dot_general, so quantizing the conv stack (or anything
else) buys bandwidth only, which the VMEM-resident fused kernel already
doesn't spend. W8A8 conv quantization: measured-and-rejected without
needing the accuracy argument.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(a_ref, w_ref, o_ref, *, acc_t):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    )


def tiled_matmul(a, w, block_m=1024, acc_t=jnp.int32):
    M, K = a.shape
    _, N = w.shape
    return pl.pallas_call(
        functools.partial(_kernel, acc_t=acc_t),
        grid=(M // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_t),
    )(a, w)


def timed(fn, *args, iters=30, warmup=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out[:8, :8].astype(jnp.float32)))  # hard sync (axon)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[:8, :8].astype(jnp.float32)))
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    M, K, N = 131072, 2048, 256
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), dtype=jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), dtype=jnp.int8)
    ab, wb = a8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16)
    flops = 2.0 * M * K * N

    # correctness first (tiny slice vs XLA int32 reference)
    ref = jax.lax.dot_general(
        a8[:1024].astype(jnp.int32), w8.astype(jnp.int32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    )
    got = tiled_matmul(a8[:1024], w8, block_m=1024)
    assert jnp.array_equal(ref, got), "int8 pallas dot mismatch"
    print("int8 pallas dot: exact vs XLA int32 reference", flush=True)

    f_i8 = jax.jit(lambda a, w: tiled_matmul(a, w, acc_t=jnp.int32))
    f_bf = jax.jit(lambda a, w: tiled_matmul(a, w, acc_t=jnp.float32))
    ti = timed(f_i8, a8, w8)
    tb = timed(f_bf, ab, wb)
    print(
        f"pallas  bf16 {tb * 1e3:7.3f} ms = {flops / tb / 1e12:6.1f} TF/s"
        f"  | int8 {ti * 1e3:7.3f} ms = {flops / ti / 1e12:6.1f} TOPS"
        f"  | speedup {tb / ti:4.2f}x",
        flush=True,
    )


if __name__ == "__main__" and "--vmem" not in sys.argv:
    main()


def _kernel_loop(a_ref, w_ref, o_ref, *, acc_t, reps):
    """reps dots on the SAME VMEM block: amortizes HBM so the measured
    rate is the raw MXU issue rate at this dtype (the fused conv kernel's
    regime — activations never leave VMEM).

    Each iteration's LHS depends on the previous accumulator (row 0 gets
    acc[0,0] folded in, a ~K-element VPU add) so no compiler version can
    hoist the loop-invariant dot or strength-reduce the loop to
    reps * dot — which would silently inflate the measured rate ~reps x
    (advisor finding r3). The perturbation's VPU cost is negligible next
    to the (block_m, K) x (K, N) MXU work."""
    def body(i, acc):
        a = a_ref[:].at[0].add(acc[0, :1].astype(a_ref.dtype))
        return acc + jax.lax.dot_general(
            a, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        )
    o_ref[:] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros(o_ref.shape, acc_t)
    )


def vmem_rate(dtype, acc_t, M=8192, K=2048, N=256, block_m=512, reps=16):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 128, (M, K)), dtype=dtype)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), dtype=dtype)
    f = jax.jit(lambda a, w: pl.pallas_call(
        functools.partial(_kernel_loop, acc_t=acc_t, reps=reps),
        grid=(M // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_t),
    )(a, w))
    t = timed(f, a, w)
    flops = 2.0 * M * K * N * reps
    print(f"VMEM-resident {dtype.__name__:9s} x{reps}: {t * 1e3:7.3f} ms "
          f"= {flops / t / 1e12:6.1f} T/s", flush=True)
    return flops / t / 1e12


def main_vmem():
    i8 = vmem_rate(jnp.int8, jnp.int32)
    bf = vmem_rate(jnp.bfloat16, jnp.float32)
    # sanity guard: if a future compiler still managed to elide dots, the
    # apparent rate would blow past any physical MXU rate (int8 nominal
    # is 2x the bf16 peak); bound taken from THIS device's peak so the
    # bench stays valid on v5p/v6e
    from voiceactivityprojection_tpu.utils.flops import device_peak_tflops

    peak = device_peak_tflops() or 197.0
    assert bf < 2.0 * peak and i8 < 2.5 * peak, (
        f"measured rate exceeds hardware peak (bf16 {bf:.0f}, int8 {i8:.0f} "
        f"T/s vs bf16 peak {peak:.0f}): the bench loop was likely "
        "optimized away")
    print(f"int8/bf16 MXU issue-rate ratio: {i8 / bf:4.2f}x", flush=True)


if __name__ == "__main__" and "--vmem" in sys.argv:
    main_vmem()
