"""Why do the flash single-block matmuls run at ~22% of MXU peak?

The round-3 floor measurement (examples/bench_attention.py `mxu_floor`)
showed the matmuls-only kernel at 3.17 ms/pass vs the full v1 kernel's
3.49 (B=64, H=4, T=1000, bf16) — the (Tp, Tp) softmax plane chain is
nearly free and the QK^T/PV matmuls with Dh=64 ARE the cost. This script
isolates the mechanisms:

  floor/fori      — baseline: fori_loop over heads, serial QK -> PV
  floor/unroll    — python-unrolled heads (lets Mosaic interleave head
                    h+1's QK with head h's PV)
  floor/batched   — ONE batched dot_general over the H axis
  floor/kpad128   — Dh zero-padded 64 -> 128 (tests the K-underfill model:
                    if K=64 runs at half rate, padding to 128 costs the
                    same cycles)
  floor/qkonly    — QK^T only, no PV (splits the two matmuls' costs)

Usage: python examples/bench_attn_mxu.py [B] [T]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, jfn, *args, iters=20):
    acc = jnp.zeros(())
    for _ in range(10):
        acc = acc + jfn(*args).astype(jnp.float32).sum()
    float(acc)
    t0 = time.time()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = acc + jfn(*args).astype(jnp.float32).sum()
    float(acc)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:32s} {ms:8.3f} ms/pass", flush=True)
    return ms


def make_floor(B, H, tp, Dh, body):
    def call(q, k, v):
        return pl.pallas_call(
            body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(B,),
                in_specs=[pl.BlockSpec((1, H, tp, Dh), lambda b: (b, 0, 0, 0))] * 3,
                out_specs=pl.BlockSpec((1, H, tp, Dh), lambda b: (b, 0, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, tp, Dh), q.dtype),
            interpret=jax.default_backend() == "cpu",
        )(q, k, v)

    return jax.jit(call)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    H, Dh = 4, 64
    tp = -(-T // 128) * 128
    rng = np.random.default_rng(0)
    mk = lambda d: jnp.asarray(rng.normal(size=(B, H, tp, d)), jnp.bfloat16)
    q, k, v = mk(Dh), mk(Dh), mk(Dh)

    f32 = jnp.float32
    dn_qk = (((1,), (1,)), ((), ()))
    dn_pv = (((1,), (0,)), ((), ()))

    def qk_pv(qh, kh, vh):
        s = jax.lax.dot_general(qh, kh, dn_qk, preferred_element_type=f32)
        p = s.astype(jnp.bfloat16)
        return jax.lax.dot_general(p, vh, dn_pv, preferred_element_type=f32)

    def body_fori(q_ref, k_ref, v_ref, o_ref):
        def step(h, c):
            o_ref[0, h] = qk_pv(q_ref[0, h], k_ref[0, h], v_ref[0, h]).astype(
                o_ref.dtype
            )
            return c

        jax.lax.fori_loop(0, H, step, 0)

    def body_unroll(q_ref, k_ref, v_ref, o_ref):
        for h in range(H):
            o_ref[0, h] = qk_pv(q_ref[0, h], k_ref[0, h], v_ref[0, h]).astype(
                o_ref.dtype
            )

    def body_batched(q_ref, k_ref, v_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0],
            (((2,), (2,)), ((0,), (0,))),  # batch over H
            preferred_element_type=f32,
        ).astype(jnp.bfloat16)  # (H, tp, tp)
        o_ref[0] = jax.lax.dot_general(
            s, v_ref[0],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        ).astype(o_ref.dtype)

    def body_qkonly(q_ref, k_ref, v_ref, o_ref):
        for h in range(H):
            s = jax.lax.dot_general(
                q_ref[0, h], k_ref[0, h], dn_qk, preferred_element_type=f32
            )
            # reduce the (tp, tp) plane to (tp, Dh) so the output write is
            # comparable; one cheap slice, no second matmul
            o_ref[0, h] = s[:, :Dh].astype(o_ref.dtype)

    timeit("floor/fori", make_floor(B, H, tp, Dh, body_fori), q, k, v)
    timeit("floor/unroll", make_floor(B, H, tp, Dh, body_unroll), q, k, v)
    timeit("floor/batched", make_floor(B, H, tp, Dh, body_batched), q, k, v)
    timeit("floor/qkonly", make_floor(B, H, tp, Dh, body_qkonly), q, k, v)

    # K padded to 128: same matmul COUNT, full contraction lanes
    q128, k128 = (jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, 64)]) for x in (q, k))

    def body_kpad(q_ref, k_ref, v_ref, o_ref):
        for h in range(H):
            s = jax.lax.dot_general(
                q_ref[0, h], k_ref[0, h], dn_qk, preferred_element_type=f32
            ).astype(jnp.bfloat16)
            o_ref[0, h] = jax.lax.dot_general(
                s, v_ref[0, h], dn_pv, preferred_element_type=f32
            ).astype(o_ref.dtype)

    def call_kpad(q, k, v):
        return pl.pallas_call(
            body_kpad,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, H, tp, 128), lambda b: (b, 0, 0, 0)),
                    pl.BlockSpec((1, H, tp, 128), lambda b: (b, 0, 0, 0)),
                    pl.BlockSpec((1, H, tp, Dh), lambda b: (b, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, H, tp, Dh), lambda b: (b, 0, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, tp, Dh), q.dtype),
            interpret=jax.default_backend() == "cpu",
        )(q, k, v)

    timeit("floor/kpad128", jax.jit(call_kpad), q128, k128, v)

    # pure-XLA batched reference for the same math (no Pallas)
    def xla_floor(q, k, v):
        s = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.bfloat16)
        return jnp.einsum("bhij,bhjd->bhid", s, v)

    timeit("floor/xla-einsum", jax.jit(xla_floor), q, k, v)


if __name__ == "__main__":
    main()
