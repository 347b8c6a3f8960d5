"""Per-stage forward profile on the real chip at the bench shape.

Times each pipeline stage of the stereo VAP forward in isolation
(bf16, B=64 x 20 s => encoder rows R=128, T50=1000) plus single
attention passes, so kernel work targets the measured hotspot rather
than stale numbers. Prints one line per stage.

Usage: python examples/profile_stages.py [batch]
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


def timeit(name, fn, *args, iters=10, gflops=None, peak=None):
    """fn must return a scalar-reducible array; chains iters dispatches,
    one host fetch at the end (tunnel sync idiom, see bench.py). When
    gflops (per call) is given, prints the stage roofline: achieved
    TFLOP/s and % of chip bf16 peak."""
    jfn = jax.jit(fn)
    # compile + warmup round (first ~10 dispatches post-compile run slow)
    acc = jnp.zeros(())
    for _ in range(8):
        acc = acc + jfn(*args).sum()
    float(acc)
    t0 = time.time()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = acc + jfn(*args).sum()
    float(acc)
    ms = (time.time() - t0) / iters * 1e3
    roofline = ""
    if gflops is not None:
        tfps = gflops / ms  # G / ms == T/s
        roofline = f"  {gflops:9.1f} G  {tfps:7.1f} TFLOP/s"
        if peak:
            roofline += f"  {100 * tfps / peak:5.1f}% peak"
    print(f"{name:38s} {ms:8.2f} ms{roofline}")
    return ms


def main():
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.vap import (
        forward,
        init_vap,
        probs_from_logits,
    )
    from voiceactivityprojection_tpu.models.encoder import _downsample
    from voiceactivityprojection_tpu.models.transformer import (
        apply_gpt,
        apply_gpt_stereo,
    )
    from voiceactivityprojection_tpu.ops.conv_stack_fused import fused_conv_stack
    from voiceactivityprojection_tpu.ops.gru import gru
    from voiceactivityprojection_tpu.ops.attention import attention

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = 320_000
    T50 = 1000
    conf = VapConfig(dtype="bfloat16")
    params = init_vap(jax.random.key(0), conf)
    bf = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, t
    )
    enc = cast(params["encoder"])

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, 2, n)).astype(np.float32) * 0.1)
    rows = wav.reshape(B * 2, n).astype(bf)
    z100 = jnp.asarray(rng.normal(size=(B * 2, n // 160, 256)), bf)
    z50 = jnp.asarray(rng.normal(size=(B, T50, 256)), bf)
    x1 = jnp.asarray(rng.normal(size=(B, T50, 256)), bf)
    x2 = jnp.asarray(rng.normal(size=(B, T50, 256)), bf)

    from voiceactivityprojection_tpu.utils.flops import (
        device_peak_tflops,
        stereo_forward_flops,
    )

    fl = stereo_forward_flops(n, conf.dim, conf.channel_layers, conf.cross_layers)
    peak = device_peak_tflops()
    G = lambda key: B * fl[key] / 1e9

    def fwd_probs(w):
        out = forward(params, w, conf)  # ONE forward; relying on XLA CSE
        #                                 to dedupe two calls is fragile
        return probs_from_logits(out["logits"], out["vad"], conf)["p_now"]

    total = timeit("full forward+probs", fwd_probs, wav, gflops=G("total"), peak=peak)

    def fwd_only(w):
        out = forward(params, w, conf)
        return out["logits"].astype(jnp.float32).sum() + out["vad"].astype(jnp.float32).sum()

    timeit("full forward", fwd_only, wav, gflops=G("total"), peak=peak)

    timeit(
        "conv stack (fused, R=2B)",
        lambda r: fused_conv_stack(enc, r), rows,
        gflops=G("conv_stack"), peak=peak,
    )
    timeit("gru (R=2B)", lambda z: gru(enc["gAR"], z)[0], z100,
           gflops=G("gru"), peak=peak)
    timeit("downsample (R=2B)", lambda z: _downsample(enc, z), z100,
           gflops=G("downsample"), peak=peak)
    timeit(
        "ar_channel GPT 1L (B)",
        lambda x: apply_gpt(
            cast(params["ar_channel"]), x, num_heads=conf.num_heads
        )["x"],
        x1,
        gflops=G("ar_channel") / 2,  # one channel here
        peak=peak,
    )
    timeit(
        "ar stereo GPT 3L (B)",
        lambda a, b: apply_gpt_stereo(
            cast(params["ar"]), a, b, num_heads=conf.num_heads
        )["x"],
        x1,
        x2,
        gflops=G("ar_stereo"),
        peak=peak,
    )
    timeit(
        "one attention pass (B)",
        lambda x: attention(
            cast(params["ar_channel"])["layers"][0]["mha"],
            x, x, conf.num_heads,
        )[0],
        x1,
    )
    timeit(
        "one attention pass (2B)",
        lambda x: attention(
            cast(params["ar_channel"])["layers"][0]["mha"],
            x, x, conf.num_heads,
        )[0],
        jnp.concatenate([x1, x2], 0),
    )
    timeit(
        "probs_from_logits",
        lambda l, v: probs_from_logits(l, v, conf)["p_now"],
        jnp.asarray(rng.normal(size=(B, T50, 256)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, T50, 2)), jnp.float32),
    )
    print(f"# B={B} total={total:.2f} ms")


if __name__ == "__main__":
    main()
