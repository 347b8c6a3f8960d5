"""Generate a synthetic two-speaker dialog corpus for smoke training.

Speakers are distinguishable by voice (harmonic stacks at different f0 with
jitter + AM), turn-taking follows alternating IPUs with pauses, occasional
overlaps, and short backchannels — enough signal for the model to learn
VAD and turn-shift statistics from audio alone.

    python examples/make_synthetic_corpus.py --out DIR --n 40 --duration 60
"""
import argparse, json, os, wave
import numpy as np

SR = 16000

def speaker_burst(rng, dur, f0):
    n = int(dur * SR)
    t = np.arange(n) / SR
    f = f0 * (1 + 0.03 * np.sin(2 * np.pi * rng.uniform(1, 4) * t))
    sig = np.zeros(n)
    for h in range(1, 5):
        sig += np.sin(2 * np.pi * h * np.cumsum(f) / SR) / h
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2, 6) * t - np.pi / 2))
    sig *= env * rng.uniform(0.05, 0.15)
    sig += 0.005 * rng.normal(size=n)
    ramp = min(400, n // 4)
    w = np.ones(n); w[:ramp] = np.linspace(0, 1, ramp); w[-ramp:] = np.linspace(1, 0, ramp)
    return (sig * w).astype(np.float32)

def make_session(rng, duration):
    n = int(duration * SR)
    wav = np.zeros((2, n), dtype=np.float32)
    vl = [[], []]
    t, ch = 0.0, int(rng.random() < 0.5)
    f0s = (130.0, 210.0)
    while t < duration - 2.0:
        dur = float(rng.uniform(0.8, 3.5))
        end = min(t + dur, duration)
        s0, s1 = int(t * SR), int(end * SR)
        burst = speaker_burst(rng, (s1 - s0) / SR + 1e-4, f0s[ch])
        wav[ch, s0:s1] += burst[: s1 - s0]
        vl[ch].append([round(t, 2), round(end, 2)])
        # occasional backchannel from the other speaker mid-turn
        if rng.random() < 0.25 and end - t > 1.5:
            bt = t + rng.uniform(0.4, end - t - 0.6)
            bd = rng.uniform(0.15, 0.5)
            b0, b1 = int(bt * SR), int((bt + bd) * SR)
            bb = speaker_burst(rng, (b1 - b0) / SR + 1e-4, f0s[1 - ch])
            wav[1 - ch, b0:b1] += bb[: b1 - b0]
            vl[1 - ch].append([round(bt, 2), round(bt + bd, 2)])
        gap = float(rng.uniform(0.15, 0.9))
        if rng.random() < 0.15:
            gap = -rng.uniform(0.1, 0.3)  # overlap at the shift
        t = end + gap
        if rng.random() < 0.75:
            ch = 1 - ch  # shift; else hold (same speaker continues)
    for c in range(2):
        vl[c].sort()
    return wav, vl

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    rows = []
    for i in range(args.n):
        wav, vl = make_session(rng, args.duration)
        wp = os.path.join(args.out, f"s{i:03d}.wav")
        vp = os.path.join(args.out, f"s{i:03d}_vad.json")
        pcm = (np.clip(wav.T, -1, 1) * 32767).astype(np.int16)
        with wave.open(wp, "wb") as f:
            f.setnchannels(2); f.setsampwidth(2); f.setframerate(SR)
            f.writeframes(pcm.tobytes())
        json.dump(vl, open(vp, "w"))
        rows.append((wp, vp))
    k = max(1, int(0.8 * len(rows)))
    for name, subset in [("train", rows[:k]), ("val", rows[k:])]:
        with open(os.path.join(args.out, f"{name}.csv"), "w") as f:
            f.write("audio_path,vad_path,start,end\n")
            for wp, vp in subset:
                f.write(f"{wp},{vp},,\n")
    print(f"wrote {len(rows)} sessions -> {args.out}")

if __name__ == "__main__":
    main()
