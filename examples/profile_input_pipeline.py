"""Input-pipeline throughput profiler (VERDICT round-1 item 2).

Measures, on a real on-disk corpus, everything the device does NOT do:

  1. loader throughput — audio decode + resample + VAD-onehot + batching
     (data/dataset.py), reported as audio-seconds/s and ms/batch;
  2. event extraction — TurnTakingEvents on each batch's VAD
     (events/events.py), ms/batch, as run in every val epoch;
  3. flip_channels cost, ms/batch (the other augmentations run inside
     the fused train step on device).

Compare against the measured device step (62 ms @ B=16 on v5e): the
pipeline is "training-scale ready" when loader ms/batch << step time so
prefetch hides it entirely.

    python examples/profile_input_pipeline.py --csv /tmp/corpus400/train.csv
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--audio_duration", type=float, default=20.0)
    ap.add_argument("--n_batches", type=int, default=50)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    setup_runtime(args.platform)

    import jax

    from voiceactivityprojection_tpu.config import EventConfig
    from voiceactivityprojection_tpu.data.dataset import (
        SlidingWindowDataset,
        VapDataLoader,
    )
    from voiceactivityprojection_tpu.events.events import TurnTakingEvents
    from voiceactivityprojection_tpu.train.augment import flip_channels

    ds = SlidingWindowDataset(args.csv, audio_duration=args.audio_duration)
    loader = VapDataLoader(
        ds,
        batch_size=args.batch_size,
        shuffle=True,
        num_workers=args.num_workers,
        prefetch=0,  # measure raw production rate, not consumer overlap
    )
    n = min(args.n_batches, len(loader))
    audio_s_per_batch = args.batch_size * args.audio_duration

    # ---- 1. loader
    it = iter(loader)
    first = next(it)  # warm caches (vad json, file handles)
    t0 = time.perf_counter()
    batches = []
    got = 0
    for b in it:
        got += 1
        if len(batches) < 8:
            batches.append(b)
        if got + 1 >= n:
            break
    dt = time.perf_counter() - t0
    got = max(got, 1)
    loader_ms = 1e3 * dt / got
    loader_audio_sps = got * audio_s_per_batch / dt
    print(
        f"loader: {loader_ms:.1f} ms/batch  {loader_audio_sps:,.0f} audio-s/s "
        f"(B={args.batch_size}, {args.audio_duration}s windows, "
        f"{args.num_workers} workers, {got} batches)"
    )

    batches = batches or [first]

    # ---- 2. event extraction (val-epoch host work)
    ev = TurnTakingEvents(EventConfig(), seed=0)
    ev(np.asarray(batches[0]["vad"]))  # warm
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < 3.0:
        for b in batches:
            ev(np.asarray(b["vad"]))
            reps += 1
    ev_ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"events: {ev_ms:.1f} ms/batch ({reps} reps)")

    # ---- 3. batch mutation cost (flip; the rest runs inside the fused
    # train step on device, see train/augment.py augment_on_device)
    import jax.numpy as jnp

    key = jax.random.key(0)
    jb = {k: jnp.asarray(v) for k, v in batches[0].items() if k != "session"}
    flip_channels(jb, key, 0.5)["waveform"].block_until_ready()
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < 2.0:
        out = flip_channels(jb, key, 0.5)
        out["waveform"].block_until_ready()
        reps += 1
    flip_ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"flip_channels: {flip_ms:.1f} ms/batch")

    step_ms = 62.0  # measured v5e train step @ B=16 (PARITY.md)
    print(
        f"\nsummary: loader {loader_ms:.1f} ms/batch vs device step "
        f"{step_ms:.0f} ms — {'HIDDEN by prefetch' if loader_ms < step_ms else 'LOADER-BOUND'}"
        f"; val-epoch events add {ev_ms:.1f} ms/batch on host"
    )


if __name__ == "__main__":
    main()
