"""Synthetic phrases corpus: dataset + turn-shift probability probe.

Mirrors reference vap/phrases/dataset.py:16-357: a 180-sample TTS corpus
(9 phrase types x short/long x 2 genders x 5 voices, with alignments and a
syntactic-completion-point `scp` column). Each sample is padded with 2 s
of trailing silence and a silent channel-2, and the probe measures mean
next-speaker-shift probability in hold / prediction / reactive regions
around the end-of-turn (and SCP for long phrases).

TPU-first: instead of per-batch dynamic padding (reference
phrases_collate_fn, dataset.py:129-145), ALL samples are padded to one
corpus-wide maximum length — a single XLA compilation covers the whole
probe pass, and region slicing happens host-side.

The corpus itself (csv + wavs) ships with the reference checkout; default
root is the read-only mount."""

from __future__ import annotations

import ast
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from voiceactivityprojection_tpu.ops.audio import load_waveform
from voiceactivityprojection_tpu.ops.vad import vad_list_to_onehot
from voiceactivityprojection_tpu.utils.units import time_to_frames, time_to_samples

DEFAULT_PHRASES_ROOT = "/root/reference"
PHRASE_CSV = "dataset_phrases/phrases.csv"

# phrase -> word at the syntactic completion point (reference
# vap/phrases/dataset.py:18-28)
EXAMPLE_TO_SCP_WORD = {
    "student": "student",
    "psychology": "psychology",
    "first_year": "student",
    "basketball": "basketball",
    "experiment": "before",
    "live": "yourself",
    "work": "side",
    "bike": "bike",
    "drive": "here",
}


def load_phrase_dataframe(csv_path: str):
    """CSV with list-typed columns parsed (contract of
    vap/phrases/dataset.py:31-56)."""
    import pandas as pd

    list_cols = [
        "starts", "ends", "vad_list", "phone_starts", "phone_ends",
        "words", "phones",
    ]
    converters = {c: ast.literal_eval for c in list_cols}
    return pd.read_csv(csv_path, converters=converters)


class PhraseDataset:
    """360 phrase samples -> fixed-shape stereo batches."""

    def __init__(
        self,
        root: str = DEFAULT_PHRASES_ROOT,
        csv_path: Optional[str] = None,
        sample_rate: int = 16_000,
        audio_mono: bool = False,
        silence: float = 2.0,
        vad_hz: int = 50,
        vad_horizon: float = 2.0,
        limit: int = 0,
    ):
        self.root = root
        self.df = load_phrase_dataframe(csv_path or os.path.join(root, PHRASE_CSV))
        if limit:
            # debug/fast-probe cap: a BALANCED subset (both lengths, so the
            # val_ps_*/val_pl_*/val_pls_* scalar families all stay defined).
            # Each length keeps >=1 row even at limit=1 (balance beats the
            # exact cap — val_log_stats indexes both bucket families).
            import pandas as pd

            short = self.df[self.df["long_short"] == "short"].iloc[
                : max(1, (limit + 1) // 2)
            ]
            long_ = self.df[self.df["long_short"] == "long"].iloc[: max(1, limit // 2)]
            self.df = pd.concat([short, long_]).reset_index(drop=True)
        self.sample_rate = sample_rate
        self.audio_mono = audio_mono
        self.silence = silence
        self.vad_hz = vad_hz
        self.vad_hop_time = 1.0 / vad_hz
        self.vad_horizon = vad_horizon
        self._wav_cache: Dict[str, np.ndarray] = {}

        # corpus-wide max duration -> single padded shape
        self.max_time = float(
            max(row["ends"][-1] for _, row in self.df.iterrows()) + silence
        )
        self.n_samples = time_to_samples(self.max_time, sample_rate)
        self.n_frames = time_to_frames(self.max_time, self.vad_hop_time)

    def __len__(self) -> int:
        return len(self.df)

    def get_sample(self, phrase: str, long_short: str, gender: str, phrase_idx: int):
        m = self.df
        row = m.loc[
            (m["phrase"] == phrase)
            & (m["long_short"] == long_short)
            & (m["gender"] == gender)
            & (m["phrase_idx"] == phrase_idx)
        ].iloc[0]
        return self._to_output(row)

    def _to_output(self, row) -> Dict[str, Any]:
        audio_path = os.path.join(self.root, row["audio_path"])
        # decoded-waveform cache: the val-epoch probe iterates the whole
        # corpus EVERY epoch; re-decoding 360 wavs per epoch costs more
        # host time than the on-chip forwards. Raw mono wavs are ~150 MB
        # total for the reference corpus.
        w = self._wav_cache.get(audio_path)
        if w is None:
            w, _ = load_waveform(
                audio_path, sample_rate=self.sample_rate, mono=True
            )
            w = w[0]  # phrases are mono files
            self._wav_cache[audio_path] = w

        out = np.zeros(self.n_samples, dtype=np.float32)
        out[: min(len(w), self.n_samples)] = w[: self.n_samples]
        if self.audio_mono:
            waveform = out[None]  # (1, n)
        else:
            waveform = np.stack([out, np.zeros_like(out)])  # silent channel B

        vad = vad_list_to_onehot(
            row["vad_list"], duration=self.max_time, hop_time=self.vad_hop_time
        )
        return {
            "waveform": waveform,
            "vad": vad,
            "scp": time_to_frames(row["scp"], self.vad_hop_time),
            "end": time_to_frames(row["ends"][-1], self.vad_hop_time),
            "phrase": row["phrase"],
            "long_short": row["long_short"],
            "gender": row["gender"],
            "phrase_idx": int(row["phrase_idx"]),
            "audio_path": audio_path,
            "words": row["words"],
            "starts": row["starts"],
            "ends": row["ends"],
        }

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self._to_output(self.df.iloc[idx])

    def batches(self, batch_size: int = 10):
        """Fixed-shape batches over the whole corpus."""
        for i in range(0, len(self), batch_size):
            items = [self[j] for j in range(i, min(i + batch_size, len(self)))]
            yield {
                "waveform": np.stack([it["waveform"] for it in items]),
                "vad": np.stack([it["vad"] for it in items]),
                "scp": [it["scp"] for it in items],
                "end": [it["end"] for it in items],
                "long_short": [it["long_short"] for it in items],
                "phrase": [it["phrase"] for it in items],
            }


def get_region_shift_probs(
    p: np.ndarray, end: int, region_frames: int, speaker: int = 1
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hold, pred, react) shift-prob slices around frame `end`
    (vap/phrases/dataset.py:148-158)."""
    assert p.ndim == 2, f"expected (n_frames, 2), got {p.shape}"
    pred_start = end - region_frames
    react_end = end + region_frames
    return (
        p[:pred_start, speaker],
        p[pred_start:end, speaker],
        p[end:react_end, speaker],
    )


class PhraseProbe:
    """Turn-shift probe over the phrase corpus (PhrasesCallback equivalent,
    vap/phrases/dataset.py:161-300). Call `extract_stats(model)` to get
    (means, stds) of shift probability per region/readout/length."""

    def __init__(
        self,
        root: str = DEFAULT_PHRASES_ROOT,
        region_time: float = 0.2,
        silence: float = 2.0,
        batch_size: int = 10,
        mono: bool = False,
        limit: int = 0,
        va_history_times: Tuple[float, ...] = (60.0, 30.0, 10.0, 5.0),
    ):
        self.dset = PhraseDataset(
            root=root, audio_mono=mono, silence=silence, limit=limit
        )
        self.region_frames = time_to_frames(region_time, self.dset.vad_hop_time)
        self.batch_size = batch_size
        # mono models trained with va_history must be probed WITH it (the
        # reference passes vad_history during phrase evaluation,
        # vap/phrases/evaluation_phrases.py:339-349); derived per batch
        # from the sample's own vad (no prior context exists for a phrase)
        self.va_history_frames = tuple(
            int(round(t * self.dset.vad_hz)) for t in va_history_times
        )

    def extract_stats(self, model) -> Tuple[Dict[str, float], Dict[str, float]]:
        from voiceactivityprojection_tpu.ops.codebook import get_probs
        import jax.numpy as jnp

        buckets: Dict[str, List[np.ndarray]] = {}

        def add(name, arr):
            buckets.setdefault(name, []).append(np.atleast_1d(arr))

        use_vah = self.dset.audio_mono and bool(
            getattr(getattr(model, "conf", None), "va_history", False)
        )
        for batch in self.dset.batches(self.batch_size):
            w = jnp.asarray(batch["waveform"])
            if self.dset.audio_mono:
                # mono model: (B, 1, n) audio + required VAD conditioning
                vah = None
                if use_vah:
                    from voiceactivityprojection_tpu.ops.vad import (
                        get_activity_history,
                    )

                    vah = jnp.asarray(
                        np.stack([
                            get_activity_history(v, self.va_history_frames)
                            for v in batch["vad"]
                        ])
                    )
                out = model.forward(w, jnp.asarray(batch["vad"]), vah)
            else:
                out = model.forward(w)
            probs = get_probs(out["logits"])
            probs = {k: np.asarray(v) for k, v in probs.items()}
            for i in range(len(batch["end"])):
                ls = batch["long_short"][i]
                for pp in ("p_now", "p_future", "p_tot"):
                    nm = pp.replace("p_", "")
                    h, p, r = get_region_shift_probs(
                        probs[pp][i], batch["end"][i], self.region_frames
                    )
                    add(f"{ls}_{nm}_hold", h)
                    add(f"{ls}_{nm}_pred", p)
                    add(f"{ls}_{nm}_react", r)
                    if ls == "long":
                        h, p, r = get_region_shift_probs(
                            probs[pp][i], batch["scp"][i], self.region_frames
                        )
                        add(f"long_scp_{nm}_hold", h)
                        add(f"long_scp_{nm}_pred", p)
                        add(f"long_scp_{nm}_react", r)

        means = {k: float(np.concatenate(v).mean()) for k, v in buckets.items()}
        stds = {k: float(np.concatenate(v).std()) for k, v in buckets.items()}
        return means, stds

    def val_log_stats(self, means: Dict[str, float]) -> Dict[str, float]:
        """The subset logged at validation epochs (dataset.py:252-266)."""
        return {
            "val_ps_hold": means["short_future_hold"],
            "val_ps_pred": means["short_future_pred"],
            "val_ps_react": means["short_now_react"],
            "val_pl_hold": means["long_future_hold"],
            "val_pl_pred": means["long_future_pred"],
            "val_pl_react": means["long_now_react"],
            "val_pls_hold": means["long_scp_future_hold"],
            "val_pls_pred": means["long_scp_future_pred"],
            "val_pls_react": means["long_scp_now_react"],
        }


def make_phrase_probe(data_conf, mono: bool = False) -> Optional[PhraseProbe]:
    """DataConfig-gated probe construction, shared by the Trainer (every
    val epoch) and evaluate.py (test epoch) — the reference registers
    PhrasesCallback unconditionally (vap/train.py:202,
    vap/evaluation.py:298); here `data_conf.phrases_probe` is -1 auto
    (run when the corpus csv exists — the default), 0 off, 1 required
    (missing corpus errors instead of silently skipping)."""
    mode = int(getattr(data_conf, "phrases_probe", -1))
    if mode == 0:
        return None
    root = getattr(data_conf, "phrases_root", DEFAULT_PHRASES_ROOT)
    csv_path = os.path.join(root, PHRASE_CSV)
    if not os.path.isfile(csv_path):
        if mode == 1:
            raise FileNotFoundError(
                f"--data_phrases_probe 1 but no phrase corpus at {csv_path}"
            )
        return None
    return PhraseProbe(
        root=root,
        mono=mono,
        limit=int(getattr(data_conf, "phrases_probe_limit", 0)),
        va_history_times=tuple(
            getattr(data_conf, "va_history_times", (60.0, 30.0, 10.0, 5.0))
        ),
    )
