"""Churn soak for the stream-serving stack (VERDICT r4 next-round #3).

Drives ``serve.py``'s VapStreamServer over REAL ZMQ with S concurrent
sessions at live pacing for --duration seconds, with CHURN — the failure
surface the round-4 fixes (c386ca6: slot-recycling contamination,
tick-thread reset race, per-slot pending FIFO, idle eviction, req_id
reply matching) exist for:

  * sessions continuously join, run 8-30 s, then leave: 70% clean close,
    30% CRASH (stop pushing without close — idle eviction must reclaim
    the slot);
  * ~10% of pushes send two chunks back-to-back (pending FIFO fills; the
    server must consume both, in order, with both req_ids replied);
  * slots are recycled across dialogs all run long.

Contamination check: every session's audio is deterministic from its
serial (synth_speech seed). After the soak, sessions that closed cleanly
with ZERO underruns (close reply carries the per-slot count, so their
effective audio is exactly what they pushed) are replayed through a SOLO
BatchedKVStreamer and compared hop-for-hop. The first 8 hops are skipped
(recycled-slot conv-tail convergence window, see VapStreamServer
docstring); after that, any leak of another dialog's state shows up as
an O(0.1) probability deviation — the assert threshold is 0.05.

Latency: per-hop client push->reply round trip, reported p50/p90/p99
overall, plus server tick/eviction/underrun counters.

Reference anchor: sds/run_sds.py:222-263 (the single-dialog live loop
this server generalizes to S dialogs x churn).

Usage (TPU): python examples/soak_churn.py --streams 64 --duration 600
CPU smoke:   VAP_PLATFORM=cpu python examples/soak_churn.py \
                 --streams 4 --duration 20 --hop_frames 4 --pace 0.5
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import VapModel


def synth_dialog(seconds: float, sr: int, seed: int) -> np.ndarray:
    """Deterministic (2, n) stereo pseudo-dialog for session `seed`."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    x = np.zeros((2, n), np.float32)
    t, ch = 0.0, rng.integers(0, 2)
    while t < seconds - 0.5:
        dur = float(rng.uniform(0.4, 1.6))
        s0, s1 = int(t * sr), min(int((t + dur) * sr), n)
        tt = np.arange(s1 - s0) / sr
        f0 = float(rng.uniform(90, 260))
        sig = sum(np.sin(2 * np.pi * h * f0 * tt) / h for h in range(1, 4))
        x[ch, s0:s1] = 0.08 * sig * (0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * tt))
        ch = int(rng.integers(0, 2)) if rng.random() < 0.6 else ch
        t += dur + float(rng.uniform(0.05, 0.4))
    return x


class SessionResult:
    def __init__(self, serial):
        self.serial = serial
        self.outcome = "running"   # closed | crashed | error
        self.underruns = None
        self.latencies = []        # per-hop push->reply seconds
        self.outputs = []          # per-hop {key: np.ndarray}
        self.n_hops = 0
        self.error = None


def run_session(serial, port, hop_samples, sr, life_s, crash, pace_scale,
                rng_seed, keep_outputs, zctx):
    from voiceactivityprojection_tpu.inference.server import VapStreamClient

    res = SessionResult(serial)
    rng = np.random.default_rng(rng_seed)
    try:
        c = VapStreamClient(port=port, timeout_s=120.0, ctx=zctx)
        c.open()
        audio = synth_dialog(life_s + 1.0, sr, seed=serial)
        hop_s = hop_samples / sr * pace_scale
        n_hops = int(life_s * sr) // hop_samples
        start = time.time()
        i = 0
        while i < n_hops:
            # occasionally burst two chunks back-to-back (FIFO fill)
            burst = 2 if (rng.random() < 0.10 and i + 1 < n_hops) else 1
            for _ in range(burst):
                chunk = audio[:, i * hop_samples:(i + 1) * hop_samples]
                t0 = time.time()
                out = c.push(chunk)
                res.latencies.append(time.time() - t0)
                if keep_outputs:
                    res.outputs.append(
                        {k: np.asarray(v) for k, v in out.items()
                         if k in ("p_now", "p_future")}
                    )
                i += 1
            res.n_hops = i
            # live pacing against the session clock
            next_t = start + (i + 1) * hop_s
            dt = next_t - time.time()
            if dt > 0:
                time.sleep(dt)
        if crash:
            res.outcome = "crashed"
            c.session = None     # vanish without close: eviction path
            c.sock.close(0)      # shared ctx stays alive
        else:
            h = c.close()
            res.outcome = "closed"
            if h is not None:
                res.underruns = h.get("underruns")
    except Exception as e:  # noqa: BLE001 — soak must keep going
        if "not yours" in repr(e):
            # slot was evicted under us (server idle timeout) — a
            # legitimate churn outcome, not a harness failure
            res.outcome = "evicted"
        elif "no free stream slots" in repr(e):
            # churn engine respawned faster than slots freed — expected
            # back-pressure (the server correctly refuses), not a failure
            res.outcome = "rejected"
        else:
            res.outcome = "error"
            res.error = repr(e)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--duration", type=float, default=600.0)
    ap.add_argument("--hop_frames", type=int, default=2,
                    help="frames per hop (2 = 40 ms hops: through the "
                    "axon tunnel each tick pays the ~28 ms host-fetch "
                    "RTT, so 20 ms pacing cannot hold; on a local TPU "
                    "host hop_frames=1 holds at the measured 9.9 ms/tick)")
    ap.add_argument("--pace", type=float, default=1.0,
                    help="pacing scale (>1 = slower than real time)")
    ap.add_argument("--port", type=int, default=5611)
    ap.add_argument("--check_sessions", type=int, default=24,
                    help="max clean underrun-free sessions to replay solo")
    ap.add_argument("--max_wait_ms", type=float, default=15.0,
                    help="cohort deadline before a tick advances missing "
                    "slots with silence; for slowed pacing (--pace > 1) "
                    "set >= pace * hop so cohort ticks wait for every "
                    "client and sessions stay underrun-free")
    ap.add_argument("--session_timeout", type=float, default=30.0,
                    help="idle-eviction timeout; generous by default so a "
                    "transient tunnel stall does not evict the whole "
                    "cohort at once (run 2 lost all 57 initial sessions "
                    "to a 5 s timeout during a compile window)")
    ap.add_argument("--out", default="/tmp/soak_churn.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    sr = 16_000
    conf = VapConfig(dtype="bfloat16")
    model = VapModel.init(jax.random.key(0), conf)

    from voiceactivityprojection_tpu.inference.server import VapStreamServer

    server = VapStreamServer(
        model, streams=args.streams, context_time=20.0,
        hop_frames=args.hop_frames, session_timeout_s=args.session_timeout,
        max_wait_ms=args.max_wait_ms,
    )
    # prewarm: the first tick compiles the batched streamer (minutes on a
    # tunneled TPU) — run 1 compiled the shapes mid-churn and the whole
    # early session cohort timed out on it (535 'Again' errors). Compile
    # BEFORE clients exist, then reset (serve() resets again on start).
    t0 = time.time()
    server.sessions[0] = b"_prewarm"
    server._resets.add(0)  # compile the reset_stream path too
    for _ in range(2):  # full tick path: reset + push + packed single fetch
        server.pending[0] = [(None, np.zeros((2, server.hop_samples),
                                             np.float32))]
        server._tick()
    server.sessions.clear()
    server.pending.clear()
    server.slot_underruns.clear()
    server.stats.update(ticks=0, pushes=0, underruns=0, evictions=0)
    server.streamer.reset()
    print(f"prewarm compile: {time.time() - t0:.1f}s", flush=True)
    server.start(port=args.port)
    hop_samples = server.hop_samples
    print(f"server up: {args.streams} slots, hop={hop_samples} samples "
          f"({hop_samples / sr * 1e3:.0f} ms)", flush=True)

    # churn engine: keep ~90% of slots busy; one worker thread per live
    # session; respawn with a fresh serial when one ends. ONE shared ZMQ
    # context for every client (see VapStreamClient ctx doc).
    import zmq

    zctx = zmq.Context(io_threads=2)
    rng = np.random.default_rng(args.seed)
    results = []
    results_lock = threading.Lock()
    serial_ctr = {"n": 0}
    stop_at = time.time() + args.duration
    target_live = max(1, int(args.streams * 0.9))
    live = []

    def spawn():
        serial = serial_ctr["n"]
        serial_ctr["n"] += 1
        life = float(rng.uniform(8.0, 30.0))
        crash = bool(rng.random() < 0.3)
        keep = serial % 3 == 0  # keep full outputs for 1/3 (memory bound)

        def work():
            res = run_session(
                serial, args.port, hop_samples, sr, life, crash,
                args.pace, rng_seed=10_000 + serial, keep_outputs=keep,
                zctx=zctx,
            )
            with results_lock:
                results.append(res)

        t = threading.Thread(target=work, daemon=True)
        t.start()
        return t

    t_report = time.time()
    while time.time() < stop_at:
        live = [t for t in live if t.is_alive()]
        while len(live) < target_live and time.time() < stop_at:
            live.append(spawn())
            time.sleep(0.05)  # stagger joins
        time.sleep(0.25)
        if time.time() - t_report > 30:
            with results_lock:
                done = len(results)
            print(f"t={time.time() - (stop_at - args.duration):6.0f}s "
                  f"live={len(live)} done={done} stats={server.stats}",
                  flush=True)
            t_report = time.time()
    for t in live:
        t.join(timeout=60)

    with results_lock:
        results = list(results)
    lats = [r.latencies for r in results if r.latencies]
    lat = np.concatenate(lats) if lats else np.zeros(1)
    pct = lambda p: float(np.percentile(lat, p) * 1e3)
    summary = {
        "streams": args.streams,
        "duration_s": args.duration,
        "hop_ms": hop_samples / sr * 1e3,
        "pace": args.pace,
        "sessions_total": len(results),
        "sessions_closed": sum(r.outcome == "closed" for r in results),
        "sessions_crashed": sum(r.outcome == "crashed" for r in results),
        "sessions_evicted": sum(r.outcome == "evicted" for r in results),
        "sessions_rejected": sum(r.outcome == "rejected" for r in results),
        "sessions_error": sum(r.outcome == "error" for r in results),
        "errors": [r.error for r in results if r.error][:10],
        "hops_total": int(sum(r.n_hops for r in results)),
        "latency_ms_p50": pct(50), "latency_ms_p90": pct(90),
        "latency_ms_p99": pct(99), "latency_ms_max": float(lat.max() * 1e3),
        "server_stats": dict(server.stats),
    }
    print(json.dumps(summary, indent=2), flush=True)

    # ---- contamination check: replay clean underrun-free sessions solo
    from voiceactivityprojection_tpu.inference.streaming_kv import (
        BatchedKVStreamer,
    )

    candidates = [r for r in results
                  if r.outcome == "closed" and r.underruns == 0
                  and r.outputs and r.n_hops >= 16]
    print(f"contamination check: {len(candidates)} clean underrun-free "
          f"sessions with recorded outputs "
          f"(checking {min(len(candidates), args.check_sessions)})",
          flush=True)
    solo = BatchedKVStreamer(model, streams=1, context_time=20.0,
                             hop_frames=args.hop_frames)
    # Alignment: a server slot is always in RECYCLED steady mode when a
    # session starts (every open routes through reset_rows), so its first
    # push emits hop_frames frames — one bogus zero-tail frame more than
    # the fresh solo streamer's prime push (hop_frames - 1). Server frame
    # j therefore corresponds to solo frame j-1; the first skip hops are
    # additionally dropped for the conv-tail convergence window.
    skip = 8
    skip_f = skip * args.hop_frames
    diffs = []
    for r in candidates[:args.check_sessions]:
        solo.reset()
        audio = synth_dialog(
            r.n_hops * hop_samples / sr + 2.0, sr, seed=r.serial)
        keys = ("p_now", "p_future")
        srv = {k: np.concatenate([rec[k] for rec in r.outputs], 0)
               for k in keys}
        # keep replay outputs ON DEVICE and fetch ONCE per session — a
        # per-hop np.asarray is a host round trip (~28 ms tunneled), which
        # made the original checker hours-slow at 24 sessions x 400 hops
        import jax.numpy as jnp

        refs = {k: [] for k in keys}
        for i in range(len(r.outputs)):
            chunk = audio[None, :, i * hop_samples:(i + 1) * hop_samples]
            ref = solo.push(chunk)
            for k in keys:
                refs[k].append(ref[k][:, 0])
        fetched = {k: np.asarray(jnp.concatenate(refs[k], 0)) for k in keys}
        worst = 0.0
        for k in keys:
            ref_cat = fetched[k]
            L = min(len(srv[k]) - 1 - skip_f, len(ref_cat) - skip_f)
            if L <= 0:
                continue
            d = float(np.max(np.abs(
                srv[k][1 + skip_f:1 + skip_f + L]
                - ref_cat[skip_f:skip_f + L])))
            worst = max(worst, d)
        diffs.append({"serial": r.serial, "hops": len(r.outputs),
                      "max_abs_diff": worst})
        print(f"  session {r.serial}: {len(r.outputs)} hops, "
              f"max |Δp| = {worst:.2e}", flush=True)
    summary["contamination"] = {
        "checked": len(diffs),
        "skip_hops": skip,
        "max_abs_diff": max((d["max_abs_diff"] for d in diffs), default=None),
        "per_session": diffs,
    }
    if not diffs and args.check_sessions > 0:
        # a check that examined nothing must not report a pass
        ok = None
    else:
        ok = all(d["max_abs_diff"] < 0.05 for d in diffs)
    summary["contamination_ok"] = ok

    server.stop()
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"-> {args.out}  contamination_ok={ok}", flush=True)
    if ok is False:  # None = check never ran (reported, exit 0 with a note)
        sys.exit(1)
    if ok is None and args.check_sessions > 0:
        print("WARNING: contamination check had zero eligible sessions — "
              "no pass/fail claim made", flush=True)


if __name__ == "__main__":
    main()
