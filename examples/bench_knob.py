"""One-stop micro-bench for the queued perf-knob A/Bs.

Replaces the near-identical heredocs in run_onchip_checks.sh: every
target shares the same init / bf16 cast / warmup / chained-timing harness
(warmup + single host fetch per round, per the repo guide's tunnel
rules), so the sync logic lives in exactly one place.

    python examples/bench_knob.py <target> [--iters 10] [--warmup 8]

targets:
    attn_single   — single-block flash attention (VAP_FLASH_SINGLE_IMPL/CS)
    gru           — GRU recurrence at (128, 2000, 256) (VAP_GRU_GROUPS)
    encoder       — full encoder forward (VAP_GRU_DS, VAP_CONV_*)
    conv_stack    — whole-stack fused conv kernel (VAP_CONV_T1OUT)
    kv_hop        — KV-cache streaming transformer, 1-frame hop @ 20 s context
    kv_batch      — same, 64 concurrent streams per dispatch (serving shape)
    window_hop    — window-recompute streaming transformer, same hop

The relevant env knobs are read by the kernels at trace time, so set them
on the command line: VAP_GRU_GROUPS=2 python examples/bench_knob.py gru
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp

KNOBS = (
    "VAP_FLASH_SINGLE_IMPL", "VAP_FLASH_CS", "VAP_GRU_GROUPS",
    "VAP_GRU_DS", "VAP_CONV_IMPL", "VAP_CONV_T1OUT",
)


def _cast_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def _params(conf=None):
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.vap import init_vap

    return init_vap(jax.random.key(0), conf or VapConfig(dtype="bfloat16"))


def make_target(name):
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    if name == "attn_single":
        from voiceactivityprojection_tpu.ops.attention import alibi_slopes
        from voiceactivityprojection_tpu.ops import flash_alibi as fa

        B, H, T, Dh = 64, 4, 1000, 64
        scale = 1.0 / np.sqrt(H * Dh)
        mk = lambda: jnp.asarray(rng.normal(size=(B, H, T, Dh)), bf)
        q, k, v = mk(), mk(), mk()
        slopes = alibi_slopes(H)
        f = jax.jit(lambda q, k, v: fa._single_block_forward(q, k, v, slopes, scale))
        dense = jax.jit(
            lambda q, k, v: fa._dense_reference(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), slopes, scale,
            )
        )
        err = float(jnp.abs(f(q, k, v).astype(jnp.float32) - dense(q, k, v)).max())
        return (lambda: f(q, k, v)), f" (err vs dense {err:.1e})"
    if name == "gru":
        from voiceactivityprojection_tpu.ops.gru import gru

        gp = _cast_bf16(_params()["encoder"]["gAR"])
        z = jnp.asarray(rng.normal(size=(128, 2000, 256)), bf)
        f = jax.jit(lambda z: gru(gp, z)[0])
        return (lambda: f(z)), ""
    if name == "encoder":
        from voiceactivityprojection_tpu.models.encoder import apply_encoder

        enc = _cast_bf16(_params()["encoder"])
        w = jnp.asarray(rng.normal(size=(128, 320_000)).astype(np.float32) * 0.1, bf)
        f = jax.jit(lambda w: apply_encoder(enc, w, fused_auto=True))
        chk = float(f(w).astype(jnp.float32).sum())
        return (lambda: f(w)), f" (chk {chk:.1f})"
    if name == "conv_stack":
        from voiceactivityprojection_tpu.ops.conv_stack_fused import fused_conv_stack

        enc = _cast_bf16(_params()["encoder"])
        x = jnp.asarray(rng.normal(size=(128, 320_000)).astype(np.float32) * 0.1, bf)
        f = jax.jit(lambda a: fused_conv_stack(enc, a))
        return (lambda: f(x)), ""
    if name == "noop":
        # dispatch-latency floor: a trivial jitted op measured with the
        # same chained-dispatch harness — the lower bound any per-hop
        # number can reach on this backend
        x = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda a: (a + 1.0).sum())
        return (lambda: f(x)), ""
    if name in ("kv_hop", "kv_batch", "window_hop"):
        # streaming transformer cost per 1-frame hop at the full 20 s
        # context: per-layer K/V caches (1 or 64 concurrent streams) vs
        # window recompute
        from voiceactivityprojection_tpu.config import VapConfig

        conf = VapConfig()
        params = _params(conf)
        T = 1000
        if name == "window_hop":
            from voiceactivityprojection_tpu.inference.streaming import _window_step

            state = jnp.zeros((2, T, conf.dim), jnp.float32)
            feats = jnp.asarray(rng.normal(size=(2, 1, conf.dim)), jnp.float32)
            f = jax.jit(
                lambda r, nf: _window_step(params, r, nf, conf, 1)[1]["p_now"].sum()
            )
        else:
            from voiceactivityprojection_tpu.inference.streaming_kv import (
                _kv_push,
                init_kv_state,
            )

            S = int(os.environ.get("VAP_KV_STREAMS", "64")) if name == "kv_batch" else 1
            state = init_kv_state(conf, T, streams=S)
            state["n"] = jnp.full((S,), T, jnp.int32)  # steady: rings full
            feats = jnp.asarray(rng.normal(size=(S, 2, 1, conf.dim)), jnp.float32)
            f = jax.jit(
                lambda s, nf: _kv_push(params, s, nf, conf)[1]["p_now"].sum()
            )
        return (lambda: f(state, feats)), ""
    raise SystemExit(f"unknown target {name!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", choices=["attn_single", "gru", "encoder", "conv_stack", "kv_hop", "kv_batch", "window_hop", "noop"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=8)
    args = ap.parse_args()

    f, note = make_target(args.target)
    # warmup past the fresh-compile slow dispatches, ONE host fetch
    acc = jnp.zeros(())
    for _ in range(args.warmup):
        acc = acc + f().astype(jnp.float32).sum()
    float(acc)
    # timed round: chain device work, fetch once at the end
    t0 = time.time()
    acc = jnp.zeros(())
    for _ in range(args.iters):
        acc = acc + f().astype(jnp.float32).sum()
    float(acc)
    ms = (time.time() - t0) / args.iters * 1e3
    knobs = " ".join(f"{k}={os.environ[k]}" for k in KNOBS if k in os.environ)
    print(f"{args.target}: {ms:.2f} ms/iter [{knobs or 'defaults'}]{note}")


if __name__ == "__main__":
    main()
