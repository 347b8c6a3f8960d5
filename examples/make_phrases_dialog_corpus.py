"""Stitch the reference's 360 REAL TTS phrase wavs into two-channel
pseudo-dialog sessions for training.

The reference's phrases evaluation (vap/phrases/evaluation_phrases.py)
probes whether a TRAINED model's shift probability responds to prosody
(flat F0, flat intensity, ...) in the predictive region before end-of-turn
— the SIGDIAL-2022 analysis. The reference trains on Switchboard, which is
absent here; this generator builds the closest trainable substitute from
the mount's own real-speech corpus (dataset_phrases/: 9 phrases x
short/long x 10 Google TTS voices, word alignments + vad lists included):

  * each session interleaves complete phrases from TWO distinct voices on
    two channels — every phrase ends in a real end-of-turn, so shifts are
    marked by genuine phrase-final prosody (falling F0, lengthening);
  * HOLD transitions (same speaker continues after a pause) are mixed in
    so silence alone does not predict a shift — the model must read the
    turn-holding vs turn-yielding cues;
  * occasional short overlaps at shifts mirror real dialog timing;
  * per-phrase RMS normalization, uniform gaps/pauses sampled per
    transition.

Voices are split train/val (8/2) so validation measures generalization to
unseen speakers. NOTE the probes themselves (evaluate_phrases.py) run on
all 360 wavs, which overlap the training material — documented honestly
in PARITY.md; the directionality analysis compares PERMUTATIONS of the
same audio against each other, so the leak affects absolute values, not
the flat-vs-regular contrast.

    python examples/make_phrases_dialog_corpus.py --out /tmp/phrases_dialog \
        --n_train 200 --n_val 24 --duration 24
"""

import argparse
import csv
import json
import os
import sys
import wave
from ast import literal_eval

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16_000
VAL_VOICES = ("en-US-Wavenet-F", "en-US-Wavenet-D")  # 1 female, 1 male


def read_phrase_rows(root: str):
    rows = []
    with open(os.path.join(root, "phrases.csv")) as f:
        for row in csv.DictReader(f):
            rows.append(
                {
                    "audio_path": os.path.join(
                        os.path.dirname(root.rstrip("/")), row["audio_path"]
                    )
                    if not os.path.isabs(row["audio_path"])
                    else row["audio_path"],
                    "voice": row["tts"],
                    "vad": literal_eval(row["vad_list"])[0],  # ch0 segments
                    # word alignments, for --isolate_f0 duration surgery
                    "starts": literal_eval(row["starts"]),
                    "ends": literal_eval(row["ends"]),
                }
            )
    return rows


def isolate_f0_cues(r: dict) -> None:
    """Neutralize the NON-F0 pre-end cues of one phrase in place
    (VERDICT r4 next-round #2: force the F0-contour question):

      * duration — every word PSOLA-stretched (pitch-preserving,
        ops/prosody.time_scale_psola) to the phrase's mean word duration:
        final lengthening carries zero information;
      * intensity — frame energy equalized to the mean active RMS
        (flatten_intensity): the pre-end intensity drop is gone.

    The F0 contour survives both operations, so across the corpus the
    dominant remaining within-speech pre-end cue is the pitch movement."""
    from voiceactivityprojection_tpu.ops.prosody import (
        duration_words_psola,
        flatten_intensity,
    )

    segs = list(zip(r["starts"], r["ends"]))
    y, new_segs = duration_words_psola(r["x"], segs, SR)
    y = flatten_intensity(y, SR)
    r["x"] = y
    r["vad"] = [[round(s, 3), round(e, 3)] for s, e in new_segs]


def load_wav_mono(path: str) -> np.ndarray:
    from voiceactivityprojection_tpu.ops.audio import load_waveform

    x, sr = load_waveform(path, sample_rate=SR)
    assert sr == SR
    return np.asarray(x[0], np.float32)


def make_session(rng, duration, by_voice, voices, target_rms=0.05,
                 p_shift=0.55, p_overlap=0.25, noise_rms=0.003):
    """ROUND-4 timing model (VERDICT r3 item 6): the round-3 corpus was
    silence-deterministic — shifts only ever happened after a clean gap,
    so mid-speech p_now collapsed to ~0 and predictive-region prosody
    contrasts had no dynamic range. Now:

      * 25% of shifts are IMMEDIATE FOLLOW-ONS: the next speaker starts
        up to 0.5 s BEFORE the current phrase ends, so the model must
        assign real next-speaker probability mass while speech is still
        ongoing (= exactly the predictive region the SIGDIAL analysis
        probes, evaluation_phrases.py:228-253);
      * gapped shifts draw 0.05-1.5 s and holds 0.2-1.2 s — the ranges
        OVERLAP, so pause length alone cannot separate shift from hold
        and turn-final prosody carries the signal;
      * mild Gaussian channel noise (-25 dB vs speech) so silence is not
        digitally zero."""
    n = int(duration * SR)
    wav = np.zeros((2, n), dtype=np.float32)
    vl = [[], []]
    va, vb = rng.choice(len(voices), size=2, replace=False)
    chan_voice = (voices[va], voices[vb])
    t = float(rng.uniform(0.2, 0.6))
    ch = int(rng.random() < 0.5)
    while True:
        cands = by_voice[chan_voice[ch]]
        p = cands[rng.integers(len(cands))]
        x = p["x"]
        rms = float(np.sqrt((x**2).mean()) + 1e-8)
        x = x * (target_rms / rms)
        s0 = int(t * SR)
        s1 = s0 + len(x)
        if s1 >= n - int(0.5 * SR):
            break
        wav[ch, s0:s1] += x
        for a, b in p["vad"]:
            vl[ch].append([round(t + a, 3), round(t + b, 3)])
        end = s1 / SR
        if rng.random() < p_shift:  # turn shift: other speaker next
            if rng.random() < p_overlap:
                # immediate follow-on: next speaker starts while this
                # phrase is still running
                gap = -float(rng.uniform(0.02, 0.5))
            else:
                gap = float(rng.uniform(0.05, 1.5))
            ch = 1 - ch
        else:  # hold: same speaker continues after an intra-turn pause
            gap = float(rng.uniform(0.2, 1.2))
        t = end + gap
    if noise_rms:
        wav += rng.normal(0.0, noise_rms, wav.shape).astype(np.float32)
    for c in range(2):
        vl[c].sort()
    return wav, vl


def write_wav(path, data):
    pcm = (np.clip(data.T, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/dataset_phrases")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_train", type=int, default=200)
    ap.add_argument("--n_val", type=int, default=24)
    ap.add_argument("--duration", type=float, default=24.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--p_shift", type=float, default=0.55)
    ap.add_argument("--p_overlap", type=float, default=0.25,
                    help="fraction of shifts that are immediate follow-ons "
                         "(next speaker starts before the phrase ends)")
    ap.add_argument("--noise_rms", type=float, default=0.003,
                    help="Gaussian channel-noise RMS (0 = r3 silence-exact)")
    ap.add_argument("--isolate_f0", action="store_true",
                    help="neutralize duration + intensity pre-end cues in "
                         "every phrase (F0 contour left intact) — the "
                         "cue-isolated corpus for the flat_f0 question")
    args = ap.parse_args()

    rows = read_phrase_rows(args.ref)
    by_voice = {}
    for i, r in enumerate(rows):
        r["x"] = load_wav_mono(r["audio_path"])
        if args.isolate_f0:
            isolate_f0_cues(r)
            if (i + 1) % 30 == 0:
                print(f"  isolate_f0: {i + 1}/{len(rows)} phrases", flush=True)
        by_voice.setdefault(r["voice"], []).append(r)
    all_voices = sorted(by_voice)
    val_voices = [v for v in all_voices if v in VAL_VOICES]
    train_voices = [v for v in all_voices if v not in VAL_VOICES]
    print(f"{len(rows)} phrases, {len(all_voices)} voices "
          f"({len(train_voices)} train / {len(val_voices)} val)")

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for split, n_sessions, voices in (
        ("train", args.n_train, train_voices),
        ("val", args.n_val, val_voices),
    ):
        man_rows = []
        for i in range(n_sessions):
            wav, vl = make_session(
                rng, args.duration, by_voice, voices,
                p_shift=args.p_shift, p_overlap=args.p_overlap,
                noise_rms=args.noise_rms,
            )
            wp = os.path.join(args.out, f"{split}_{i:04d}.wav")
            vp = os.path.join(args.out, f"{split}_{i:04d}_vad.json")
            write_wav(wp, wav)
            with open(vp, "w") as f:
                json.dump(vl, f)
            man_rows.append({"audio_path": wp, "vad_path": vp})
        man = os.path.join(args.out, f"{split}.csv")
        with open(man, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["audio_path", "vad_path"])
            w.writeheader()
            w.writerows(man_rows)
        print(f"{split}: {n_sessions} x {args.duration:.0f}s -> {man}")


if __name__ == "__main__":
    main()
