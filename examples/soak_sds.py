"""Real-time SDS soak test: run the streaming loop at LIVE pacing on the
chip and report hop-deadline misses + latency percentiles at 50 Hz.

The reference's SDS loop (sds/run_sds.py:222-263) runs against a live
mic with no latency accounting at all; this harness drives our
TurnTakingSDS.step at wall-clock pacing (one 20 ms hop every 20 ms, like
a sound card would deliver) and measures, per hop:

  latency  — step() wall time (encode + transformer + probs + host fetch)
  lateness — completion time vs the hop's hard deadline (start + 20ms*(i+1));
             a positive value means the hop missed real time

Modes:
  --batched S  soak the BatchedKVStreamer at S concurrent dialogs: each
               dispatch advances ALL S streams one hop and must complete
               within 20 ms for the pool to hold real time.

Usage (on the TPU):
  python examples/soak_sds.py --seconds 60
  python examples/soak_sds.py --seconds 60 --batched 128
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax

from voiceactivityprojection_tpu.config import SDSConfig, VapConfig
from voiceactivityprojection_tpu.models.vap import VapModel, init_vap


def synth_speech(seconds: float, sr: int, seed: int = 0) -> np.ndarray:
    """Speech-like mono test signal (harmonic bursts + silences)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    x = np.zeros(n, np.float32)
    t = 0.0
    while t < seconds - 1.0:
        dur = rng.uniform(0.5, 2.0)
        s0, s1 = int(t * sr), min(int((t + dur) * sr), n)
        tt = np.arange(s1 - s0) / sr
        f0 = rng.uniform(100, 250)
        sig = sum(np.sin(2 * np.pi * h * f0 * tt) / h for h in range(1, 4))
        x[s0:s1] = 0.1 * sig * (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * tt))
        t += dur + rng.uniform(0.1, 0.5)
    return x


def report(name: str, lat: np.ndarray, late: np.ndarray, hop_s: float):
    pct = lambda a, p: float(np.percentile(a, p)) * 1e3
    misses = int((late > 0).sum())
    print(
        f"{name}: hops={len(lat)} "
        f"latency p50/p90/p99/max = {pct(lat,50):.2f}/{pct(lat,90):.2f}/"
        f"{pct(lat,99):.2f}/{lat.max()*1e3:.2f} ms | "
        f"deadline({hop_s*1e3:.0f}ms) misses={misses} "
        f"({100.0*misses/len(lat):.2f}%) | "
        f"jitter(p99 lateness)={pct(np.maximum(late,0),99):.2f} ms",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--batched", type=int, default=0)
    ap.add_argument("--mode", default="window", choices=["window", "kv"])
    args = ap.parse_args()

    conf = VapConfig(dtype="bfloat16")
    model = VapModel(conf, init_vap(jax.random.key(0), conf))
    sr = 16_000
    hop_s = 0.02
    hop = int(hop_s * sr)

    wav_a = synth_speech(args.seconds + 2.0, sr, seed=0)
    wav_b = synth_speech(args.seconds + 2.0, sr, seed=1)
    stereo = np.stack([wav_a, wav_b])  # (2, n)

    if args.batched:
        from voiceactivityprojection_tpu.inference.streaming_kv import (
            BatchedKVStreamer,
        )

        S = args.batched
        streamer = BatchedKVStreamer(model, streams=S, context_time=20.0)
        n_hops = int(args.seconds / hop_s)
        # warm: compile + prime
        for i in range(50):
            chunk = np.broadcast_to(
                stereo[:, i * hop : (i + 1) * hop], (S, 2, hop)
            ).copy()
            streamer.push(chunk)
        lat = np.zeros(n_hops)
        late = np.zeros(n_hops)
        start = time.perf_counter()
        for i in range(n_hops):
            target = start + i * hop_s
            now = time.perf_counter()
            if now < target:
                time.sleep(target - now)
            t0 = time.perf_counter()
            chunk = np.broadcast_to(
                stereo[:, (50 + i) * hop : (51 + i) * hop], (S, 2, hop)
            ).copy()
            out = streamer.push(chunk)
            _ = np.asarray(out["p_now"])  # host fetch = hard sync
            t1 = time.perf_counter()
            lat[i] = t1 - t0
            late[i] = t1 - (target + hop_s)
        report(f"batched S={S} (kv pool)", lat, late, hop_s)
        return

    sds_conf = SDSConfig(transformer_mode=args.mode)
    from voiceactivityprojection_tpu.inference.sds import TurnTakingSDS

    sds = TurnTakingSDS(model, sds_conf)
    sds.stream.reset()
    n_hops = int(args.seconds / hop_s)
    for i in range(50):  # warm: compile + prime tails
        sds.step(stereo[:, i * hop : (i + 1) * hop])
    lat = np.zeros(n_hops)
    late = np.zeros(n_hops)
    start = time.perf_counter()
    for i in range(n_hops):
        target = start + i * hop_s
        now = time.perf_counter()
        if now < target:
            time.sleep(target - now)
        t0 = time.perf_counter()
        p = sds.step(stereo[:, (50 + i) * hop : (51 + i) * hop])
        t1 = time.perf_counter()
        assert 0.0 <= p <= 1.0
        lat[i] = t1 - t0
        late[i] = t1 - (target + hop_s)
    report(f"single-stream ({args.mode})", lat, late, hop_s)


if __name__ == "__main__":
    main()
