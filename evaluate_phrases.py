"""Prosody-probing evaluation over the phrases corpus
(mirrors reference vap/phrases/evaluation_phrases.py:32-577).

For each phrase sample, apply prosodic permutations:
  regular, flat_f0, only_f0 (low-pass 400 Hz), shift_f0_up/down,
  flat_intensity, duration_avg
then measure the model's next-speaker-shift probability in
hold/predictive/reactive regions at the end-of-turn (and the syntactic
completion point for long phrases). Saves a CSV of per-sample region
scores + an aggregate JSON.

    python evaluate_phrases.py [--state_dict sd.pt | --checkpoint dir]
        [--phrases_root /root/reference] [--out_dir phrases_eval]
        [--permutations regular flat_f0 ...]
"""

from __future__ import annotations

import argparse
import csv
import hashlib
import os
from typing import Dict

import numpy as np
import jax

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.data.phrases import (
    DEFAULT_PHRASES_ROOT,
    PhraseDataset,
    get_region_shift_probs,
)
from voiceactivityprojection_tpu.models.vap import VapModel, init_vap
from voiceactivityprojection_tpu.ops.codebook import get_probs
from voiceactivityprojection_tpu.ops.prosody import (
    duration_avg,
    flatten_intensity,
    flatten_pitch,
    low_pass_filter_resample,
    shift_pitch,
)
from voiceactivityprojection_tpu.utils.io import write_json

PERMUTATIONS = (
    "regular",
    "flat_f0",
    "only_f0",
    "shift_f0_up",
    "shift_f0_down",
    "flat_intensity",
    "duration_avg",
)


def permute_waveform(name: str, x: np.ndarray, sample: Dict) -> np.ndarray:
    """Apply a prosodic permutation to channel-0 audio (1-D)."""
    if name == "regular":
        return x
    if name == "flat_f0":
        return flatten_pitch(x)
    if name == "only_f0":
        return low_pass_filter_resample(x, cutoff_freq=400)
    if name == "shift_f0_up":
        return shift_pitch(x, factor=1.1)
    if name == "shift_f0_down":
        return shift_pitch(x, factor=0.9)
    if name == "flat_intensity":
        return flatten_intensity(x)
    if name == "duration_avg":
        segs = list(zip(sample["starts"], sample["ends"]))
        y = duration_avg(x, segs)
        n = len(x)
        if len(y) < n:
            y = np.pad(y, (0, n - len(y)))
        return y[:n]
    raise ValueError(f"unknown permutation {name!r}")


def main() -> None:
    parser = argparse.ArgumentParser(description="VAP phrases prosody evaluation")
    parser.add_argument("--state_dict", type=str, default="")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--phrases_root", type=str, default=DEFAULT_PHRASES_ROOT)
    parser.add_argument("--out_dir", type=str, default="phrases_eval")
    parser.add_argument("--region_time", type=float, default=0.2)
    parser.add_argument(
        "--permutations", nargs="+", default=list(PERMUTATIONS), choices=PERMUTATIONS
    )
    parser.add_argument("--limit", type=int, default=0, help="debug sample cap")
    parser.add_argument(
        "--perm_cache", type=str, default="/tmp/vap_perm_cache",
        help="directory caching permuted audio as .npy keyed by "
             "(permutation, wav name): the host-side PSOLA/low-pass DSP is "
             "identical across checkpoints, so multi-seed sweeps pay it "
             "once ('' disables)",
    )
    parser.add_argument(
        "--directionality", action="store_true",
        help="after scoring, run the paired SIGDIAL directionality "
             "analysis (analyzes/phrases_directionality.py) and save "
             "directionality.json next to the CSV",
    )
    VapConfig.add_argparse_args(parser)
    args = parser.parse_args()

    conf = VapConfig.args_to_conf(args)
    if args.state_dict:
        model = VapModel.from_torch_state_dict(args.state_dict, conf)
    else:
        model = VapModel(conf, init_vap(jax.random.key(0), conf))
        if args.checkpoint:
            from voiceactivityprojection_tpu.models.checkpoint import restore_checkpoint

            model.params = restore_checkpoint(
                os.path.abspath(args.checkpoint), {"params": model.params}
            )["params"]
        else:
            print("WARNING: random-init weights")

    dset = PhraseDataset(root=args.phrases_root)
    region_frames = int(args.region_time * dset.vad_hz)
    os.makedirs(args.out_dir, exist_ok=True)

    rows = []
    n = min(len(dset), args.limit) if args.limit else len(dset)
    for i in range(n):
        sample = dset[i]
        base = sample["waveform"][0]  # channel 0 audio
        for perm in args.permutations:
            audio = None
            cache_path = ""
            if args.perm_cache and perm != "regular":
                # key by corpus root too — identical basenames from two
                # different --phrases_root corpora must not collide
                root_key = hashlib.sha1(
                    os.path.abspath(args.phrases_root).encode()
                ).hexdigest()[:10]
                cdir = os.path.join(args.perm_cache, root_key)
                os.makedirs(cdir, exist_ok=True)
                stem = os.path.splitext(
                    os.path.basename(sample["audio_path"])
                )[0]
                cache_path = os.path.join(cdir, f"{perm}__{stem}.npy")
                if os.path.exists(cache_path):
                    cached = np.load(cache_path)
                    if cached.shape == base.shape:
                        audio = cached
            if audio is None:
                audio = permute_waveform(perm, base, sample)
                if cache_path:
                    # temp-file + rename: a concurrent sweep must never
                    # np.load a half-written file (np.save appends .npy)
                    tmp = f"{cache_path}.tmp{os.getpid()}"
                    np.save(tmp, np.asarray(audio, np.float32))
                    os.replace(tmp + ".npy", cache_path)
            stereo = np.stack([audio, np.zeros_like(audio)])[None]
            out = model.forward(jnp.asarray(stereo))
            probs = {k: np.asarray(v) for k, v in get_probs(out["logits"]).items()}
            rec = {
                "phrase": sample["phrase"],
                "long_short": sample["long_short"],
                "gender": sample["gender"],
                "phrase_idx": sample["phrase_idx"],
                "permutation": perm,
            }
            for pp in ("p_now", "p_future"):
                nm = pp.replace("p_", "")
                h, p, r = get_region_shift_probs(
                    probs[pp][0], sample["end"], region_frames
                )
                rec[f"{nm}_hold"] = float(h.mean()) if h.size else float("nan")
                rec[f"{nm}_pred"] = float(p.mean()) if p.size else float("nan")
                rec[f"{nm}_react"] = float(r.mean()) if r.size else float("nan")
                if sample["long_short"] == "long":
                    h, p, r = get_region_shift_probs(
                        probs[pp][0], sample["scp"], region_frames
                    )
                    rec[f"scp_{nm}_pred"] = float(p.mean()) if p.size else float("nan")
            rows.append(rec)
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{n} phrases", flush=True)

    csv_path = os.path.join(args.out_dir, "phrases_scores.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=sorted({k for r in rows for k in r}))
        w.writeheader()
        w.writerows(rows)

    # aggregate: mean shift probs per (permutation, long_short, region)
    agg: Dict[str, Dict] = {}
    for perm in args.permutations:
        sel = [r for r in rows if r["permutation"] == perm]
        agg[perm] = {}
        for ls in ("short", "long"):
            sub = [r for r in sel if r["long_short"] == ls]
            if not sub:
                continue
            agg[perm][ls] = {
                k: float(np.nanmean([r.get(k, np.nan) for r in sub]))
                for k in ("now_hold", "now_pred", "now_react",
                          "future_hold", "future_pred", "future_react")
            }
    write_json(agg, os.path.join(args.out_dir, "phrases_aggregate.json"))
    print(f"Saved -> {csv_path} and phrases_aggregate.json")

    if args.directionality:
        import importlib.util
        import sys as _sys

        spec = importlib.util.spec_from_file_location(
            "phrases_directionality",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "analyzes", "phrases_directionality.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        argv = _sys.argv
        _sys.argv = [
            "phrases_directionality", "--scores", csv_path,
            "--out", os.path.join(args.out_dir, "directionality.json"),
        ]
        try:
            mod.main()
        finally:
            _sys.argv = argv


if __name__ == "__main__":
    main()
