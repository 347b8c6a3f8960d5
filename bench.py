"""Throughput benchmark: stereo VAP forward on 20 s chunks, real TPU chip.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second", "value": N, "unit": "audio_s/s",
   "vs_baseline": N / 100.0}

Baseline anchor (BASELINE.md): the driver target is >100x real-time
audio-seconds per second per chip; `vs_baseline` is the ratio against that
target. The reference publishes no GPU throughput numbers to compare
against directly.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()


def _probe_device(deadline_s: float = 180.0) -> None:
    """The axon tunnel can be down for hours, in which case the first
    dispatch blocks FOREVER in C (no exception). Probe with a trivial op
    in a daemon thread; if it doesn't finish in time, print an honest
    error JSON line and hard-exit instead of hanging the driver."""
    import os
    import threading

    done = threading.Event()

    def probe():
        float(jnp.ones((8, 128)).sum())
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(deadline_s):
        print(
            json.dumps(
                {
                    "metric": "audio_seconds_per_second",
                    "value": 0.0,
                    "unit": "audio_s/s",
                    "vs_baseline": 0.0,
                    "error": f"device unreachable (probe > {deadline_s:.0f}s; "
                             "axon tunnel down?)",
                }
            ),
            flush=True,
        )
        os._exit(1)


def main() -> None:
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.vap import forward, init_vap, probs_from_logits

    _probe_device()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    chunk_s = 20.0
    sr = 16_000
    n = int(chunk_s * sr)

    # full-size model (dim 256, 1+3 layers, 4 heads); bfloat16 compute with
    # f32 norms/softmax/heads (+60% over f32 at matched batch)
    conf = VapConfig(dtype="bfloat16")
    params = init_vap(jax.random.key(0), conf)

    rng = np.random.default_rng(0)
    # distinct input buffers so no runtime can dedupe identical dispatches
    waveforms = [
        jnp.asarray(rng.normal(size=(batch, 2, n)).astype(np.float32) * 0.1)
        for _ in range(4)
    ]

    @jax.jit
    def step(params, waveform):
        out = forward(params, waveform, conf)
        p = probs_from_logits(out["logits"], out["vad"], conf)
        # scalar summary: forces full execution before the host fetch returns
        return p["p_now"].sum() + p["H"].sum()

    # compile (host fetch = hard synchronization)
    t0 = time.time()
    float(step(params, waveforms[0]))
    compile_s = time.time() - t0

    # warmup: the first several post-compile dispatches through the axon
    # tunnel run far slower than steady state (measured: the first timed
    # 10-iter round after compile averages ~10x the settled per-iter time);
    # chain a full warmup round and sync before timing
    acc = jnp.zeros(())
    for i in range(10):
        acc = acc + step(params, waveforms[i % len(waveforms)])
    float(acc)

    iters = 10
    t0 = time.time()
    acc = jnp.zeros(())
    for i in range(iters):
        # device-side accumulation chains the dependency (no per-iter host
        # round-trip through the tunnel); the single float() at the end is
        # the hard sync point
        acc = acc + step(params, waveforms[i % len(waveforms)])
    acc = float(acc)
    elapsed = time.time() - t0
    assert np.isfinite(acc)

    audio_seconds = batch * chunk_s * iters
    value = audio_seconds / elapsed

    # MFU / roofline accounting (analytic FLOPs; attention counted
    # causal-half = what the flash kernel executes, utils/flops.py)
    from voiceactivityprojection_tpu.utils.flops import (
        device_peak_tflops,
        stereo_forward_flops,
    )

    stages = stereo_forward_flops(n, conf.dim, conf.channel_layers, conf.cross_layers)
    flops_per_chunk = stages["total"]
    achieved_tflops = flops_per_chunk * batch * iters / elapsed / 1e12
    peak = device_peak_tflops()
    mfu = achieved_tflops / peak if peak else None
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second",
                "value": round(value, 2),
                "unit": "audio_s/s",
                "vs_baseline": round(value / 100.0, 3),
                "gflops_per_chunk": round(flops_per_chunk / 1e9, 2),
                "achieved_tflops": round(achieved_tflops, 2),
                "peak_bf16_tflops": peak,
                "mfu": round(mfu, 4) if mfu is not None else None,
            }
        )
    )
    breakdown = " ".join(
        f"{k}={v / 1e9:.1f}G" for k, v in stages.items() if k != "total"
    )
    print(
        f"# batch={batch} chunk={chunk_s}s iters={iters} "
        f"elapsed={elapsed:.3f}s compile={compile_s:.1f}s "
        f"platform={jax.devices()[0].platform} device={jax.devices()[0]}\n"
        f"# flops/chunk: {breakdown}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
