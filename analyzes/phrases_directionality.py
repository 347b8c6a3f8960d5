"""SIGDIAL-2022 directionality analysis of the phrases prosody probes.

The reference's phrases evaluation exists to show that the model reads
PROSODY, not just silence: flattening F0 (and intensity) on the final
words of a turn should DEPRESS the model's shift probability in the
predictive region just before the end of turn — the model hears a
turn-final contour as "done" and a flattened one as "not done yet"
(reference vap/phrases/evaluation_phrases.py:290-379).

This script turns evaluate_phrases.py's per-sample CSV into that test:
for each permutation it pairs every (phrase, long_short, gender,
phrase_idx) sample with its own regular version and reports the mean
paired difference in shift probability per region, a bootstrap 95% CI,
and a sign test — then prints an explicit pass/fail line against the
expected ordering:

  flat_f0        : shift prob should DROP around EOT vs regular
  flat_intensity : should drop
  duration_avg   : should drop (final lengthening removed)
  shift_f0_up/dn : ~NO effect (contour preserved, only the level moves)
  only_f0        : information-removal control, no signed expectation
                   (heavily low-passed speech reads as near-silence)

Usage:
    python analyzes/phrases_directionality.py --scores phrases_eval/phrases_scores.csv
"""

import argparse
import csv
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REGIONS = ("now_hold", "now_pred", "now_react",
           "future_hold", "future_pred", "future_react", "scp_now_pred")


def load_rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def paired_diffs(rows, perm, region):
    """Per-sample (permutation - regular) differences for one region."""
    key = lambda r: (r["phrase"], r["long_short"], r["gender"], r["phrase_idx"])
    reg = {key(r): r for r in rows if r["permutation"] == "regular"}
    out = []
    for r in rows:
        if r["permutation"] != perm:
            continue
        base = reg.get(key(r))
        if base is None:
            continue
        a, b = r.get(region, ""), base.get(region, "")
        try:
            a, b = float(a), float(b)
        except ValueError:
            continue
        if math.isnan(a) or math.isnan(b):
            continue
        out.append(a - b)
    return np.asarray(out)


def bootstrap_ci(d, n=2000, seed=0):
    rng = np.random.default_rng(seed)
    means = np.sort(
        rng.choice(d, size=(n, len(d)), replace=True).mean(axis=1)
    )
    return float(means[int(0.025 * n)]), float(means[int(0.975 * n)])


def sign_test_p(d):
    """Two-sided sign test (binomial, ties dropped)."""
    nz = d[d != 0]
    n = len(nz)
    if n == 0:
        return 1.0
    k = int((nz < 0).sum())
    from math import comb

    tail = sum(comb(n, j) for j in range(min(k, n - k) + 1)) / 2.0**n
    return min(1.0, 2.0 * tail)


def heldout_keys(phrases_root: str = ""):
    """(gender, phrase_idx) pairs of the voices the pseudo-dialog corpus
    generator holds out of training. Derived at runtime from the
    generator's own VAL_VOICES and the corpus csv's tts column, so an
    edit to VAL_VOICES cannot silently desynchronize the --voices split
    (advisor finding r3). Falls back to the documented mapping
    (Wavenet-F/D = phrase_idx 4) only when either source is unavailable."""
    try:
        import sys

        ex_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples")
        sys.path.insert(0, ex_dir)
        try:
            from make_phrases_dialog_corpus import VAL_VOICES  # type: ignore
        finally:
            sys.path.remove(ex_dir)

        import pandas as pd

        from voiceactivityprojection_tpu.data.phrases import (
            DEFAULT_PHRASES_ROOT,
            PHRASE_CSV,
        )

        df = pd.read_csv(os.path.join(
            phrases_root or DEFAULT_PHRASES_ROOT, PHRASE_CSV
        ))
        pairs = {
            (str(g), str(i))
            for g, i, t in zip(df["gender"], df["phrase_idx"], df["tts"])
            if t in VAL_VOICES
        }
        assert pairs, f"no corpus rows match VAL_VOICES={VAL_VOICES}"
        return pairs
    except Exception as e:  # generator or corpus not importable here
        print(f"# heldout_keys fallback (phrase_idx 4 = Wavenet-F/D): {e}")
        return {("female", "4"), ("male", "4")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scores", default="phrases_eval/phrases_scores.csv")
    ap.add_argument("--out", default="")
    ap.add_argument("--phrases_root", default="",
                    help="corpus root for the tts-column voice mapping "
                         "(default: the reference mount)")
    ap.add_argument(
        "--voices", choices=("all", "heldout", "train"), default="all",
        help="restrict the analysis by the pseudo-dialog corpus' voice "
             "split: 'heldout' keeps only the two voices the probe model "
             "never trained on (phrase_idx 4 = Wavenet-F/D), removing the "
             "train/probe audio overlap caveat entirely",
    )
    args = ap.parse_args()

    rows = load_rows(args.scores)
    if args.voices != "all":
        held = heldout_keys(args.phrases_root)
        is_held = lambda r: (r["gender"], r["phrase_idx"]) in held
        keep = is_held if args.voices == "heldout" else (
            lambda r: not is_held(r))
        rows = [r for r in rows if keep(r)]
    perms = sorted({r["permutation"] for r in rows} - {"regular"})
    report = {}
    print(f"{len(rows)} rows, permutations: {perms}\n")
    print(f"{'permutation':15s} {'region':16s} {'n':>4s} {'mean d':>9s} "
          f"{'95% CI':>20s} {'sign-p':>8s}")
    for perm in perms:
        report[perm] = {}
        for region in ("now_pred", "future_pred", "now_react", "scp_now_pred"):
            d = paired_diffs(rows, perm, region)
            if len(d) < 5:
                continue
            lo, hi = bootstrap_ci(d)
            p = sign_test_p(d)
            report[perm][region] = {
                "n": int(len(d)), "mean": float(d.mean()),
                "ci95": [lo, hi], "sign_p": p,
            }
            print(f"{perm:15s} {region:16s} {len(d):4d} {d.mean():+9.4f} "
                  f"[{lo:+8.4f}, {hi:+8.4f}] {p:8.2g}")

    # the headline SIGDIAL checks: flattening a prosodic dimension of the
    # turn-final words should DEPRESS the shift probability around EOT
    # (predictive region before it, reactive region right after); pitch
    # SHIFTS preserve the contour and should do ~nothing; only_f0 is an
    # information-removal control with no signed expectation.
    print("\n--- directionality verdicts ---")
    verdicts = {}
    checks = (
        ("flat_f0", "now_pred"), ("flat_f0", "now_react"),
        ("flat_intensity", "now_pred"), ("flat_intensity", "now_react"),
        ("duration_avg", "now_pred"), ("duration_avg", "now_react"),
    )
    for perm, region in checks:
        r = report.get(perm, {}).get(region)
        if r is None:
            continue
        lo, hi = r["ci95"]
        status = ("CONFIRMED (CI < 0)" if hi < 0 else
                  "directionally consistent (mean < 0, CI spans 0)"
                  if r["mean"] < 0 else "NOT OBSERVED (mean >= 0)")
        verdicts[f"{perm}/{region}"] = {
            "expected": "drop", "observed_mean": r["mean"],
            "ci95": r["ci95"], "status": status,
        }
        print(f"{perm:15s} {region:10s} expected drop; mean d "
              f"{r['mean']:+.4f} CI [{lo:+.4f}, {hi:+.4f}] -> {status}")
    for perm in ("shift_f0_up", "shift_f0_down"):
        r = report.get(perm, {}).get("now_react")
        if r is None:
            continue
        small = abs(r["mean"]) < 0.02
        verdicts[f"{perm}/now_react"] = {
            "expected": "~no effect (contour preserved)",
            "observed_mean": r["mean"], "ci95": r["ci95"],
            "status": "consistent (|mean| < 0.02)" if small
            else "unexpectedly large",
        }
        print(f"{perm:15s} {'now_react':10s} expected ~none; mean d "
              f"{r['mean']:+.4f} -> "
              f"{verdicts[f'{perm}/now_react']['status']}")

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"regions": report, "verdicts": verdicts}, f, indent=1)
        print(f"\nsaved -> {args.out}")


if __name__ == "__main__":
    main()
