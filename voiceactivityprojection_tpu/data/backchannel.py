"""Switchboard backchannel dataset (reference: vap/backchannel/dataset.py).

* `SWBReader` parses ms98 transcriptions (utterance + word level) and the
  dialog-act word CSVs into per-session utterance tables
  (dataset.py:25-182).
* `BackchannelDataset` slices fixed windows (15 s pre / 5 s post context)
  around annotated backchannel utterances, zero-padding at session edges
  (dataset.py:264-363). Labels originate from the phiresky
  backchannel-prediction `utterance_is_backchannel.json`
  (dataset.py:16-17); `build_backchannel_csv` regenerates the flat CSV
  from it when present.

The SWB audio itself is licensed and not shipped; `audio_root` points at a
local LDC Switchboard checkout.
"""

from __future__ import annotations

from glob import glob
from os.path import basename, exists, join
from typing import Dict, Iterator, List, Tuple

import numpy as np

from voiceactivityprojection_tpu.utils.io import read_json, read_txt
from voiceactivityprojection_tpu.utils.units import time_to_frames, time_to_samples

DEFAULT_SWB_ROOT = "/root/reference/dataset_swb"


def _is_noise_only(text: str) -> bool:
    toks = text.split()
    return all(t == "[noise]" for t in toks)


class SWBReader:
    def __init__(self, root: str = DEFAULT_SWB_ROOT):
        self.root = root
        self.anno_path = join(root, "swb_ms98_transcriptions")
        self.da_path = join(root, "swb_dialog_acts_words")
        self.split_path = join(root, "splits")
        self.session_to_path = self._session_paths()
        rel = join(root, "relative_audio_path.json")
        self.audio_rel_paths = read_json(rel) if exists(rel) else {}

    def _session_paths(self) -> Dict[str, Dict]:
        files = sorted(
            glob(join(self.anno_path, "**/*A-ms98-a-trans.text"), recursive=True)
        )
        paths: Dict[str, Dict] = {}
        for p in files:
            session = basename(p).split("-")[0][2:-1]  # swNNNNA -> NNNN
            paths[session] = {
                ch: {
                    "trans": p.replace("A-ms98-a-trans", f"{ch}-ms98-a-trans"),
                    "words": p.replace("A-ms98-a-trans", f"{ch}-ms98-a-word"),
                    "da_words": join(self.da_path, f"sw{session}{ch}-word-da.csv"),
                }
                for ch in ("A", "B")
            }
        return paths

    @property
    def sessions(self) -> List[str]:
        return list(self.session_to_path)

    def split_sessions(self, split: str) -> List[str]:
        return read_txt(join(self.split_path, f"{split}.txt"))

    def session_to_audio_path(self, session, audio_root: str) -> str:
        rel = self.audio_rel_paths[str(session)] + ".wav"
        return join(audio_root, rel)

    # -- parsing -----------------------------------------------------------
    def read_utter_trans(self, path: str) -> Dict[str, Dict]:
        """utt_idx -> {start, end, text}, silence/noise rows dropped
        (dataset.py:77-105)."""
        out: Dict[str, Dict] = {}
        for row in read_txt(path):
            utt_idx, start, end, *text_parts = row.split(" ")
            text = " ".join(text_parts)
            if text == "[silence]" or _is_noise_only(text):
                continue
            out[utt_idx] = {"start": float(start), "end": float(end), "text": text}
        return out

    def read_word_trans(self, path: str) -> List[Dict]:
        out = []
        for row in read_txt(path):
            utt_idx, start, end, text = row.strip().split()
            if text in ("[silence]", "[noise]"):
                continue
            out.append(
                {"utt_idx": utt_idx, "start": float(start), "end": float(end), "text": text}
            )
        return out

    def read_da_words(self, path: str):
        import pandas as pd

        return pd.read_csv(
            path, names=["utt_idx", "start", "end", "word", "boi", "da", "da_idx"]
        )

    def combine(self, speaker: str, words: List[Dict], utters: Dict, da_words):
        """Word-aligned utterance table for one channel (dataset.py:108-150):
        utterance boundaries snapped to word alignments, dialog acts joined."""
        import pandas as pd

        rows = []
        for utt_idx, utt in utters.items():
            w_list, starts, ends = [], [], []
            for w in words:
                if utt["end"] + 1 < w["start"]:
                    break
                if w["utt_idx"] == utt_idx:
                    w_list.append(w["text"])
                    starts.append(w["start"])
                    ends.append(w["end"])
            if not starts:  # utterance with no aligned words
                continue
            row = dict(utt)
            row.update(
                utt_idx=utt_idx,
                speaker=speaker,
                start=starts[0],
                end=ends[-1],
                starts=starts,
                ends=ends,
                words=w_list,
            )
            if da_words is not None:
                das = da_words[da_words["utt_idx"] == utt_idx]
                row["da"] = das["da"].to_list()
                row["da_boi"] = das["boi"].to_list()
            rows.append(row)
        return pd.DataFrame(rows)

    def get_session(self, session) -> Dict:
        import pandas as pd

        session = str(session)
        p = self.session_to_path[session]
        info = {}
        for ch in ("A", "B"):
            utters = self.read_utter_trans(p[ch]["trans"])
            words = self.read_word_trans(p[ch]["words"])
            da = self.read_da_words(p[ch]["da_words"]) if exists(p[ch]["da_words"]) else None
            info[ch] = self.combine(ch, words, utters, da)
        info["dialog"] = (
            pd.concat((info["A"], info["B"])).sort_values("start").reset_index(drop=True)
        )
        return info

    def iter_sessions(self) -> Iterator[Tuple[str, Dict]]:
        for session in self.sessions:
            yield session, self.get_session(session)


def build_backchannel_csv(
    bc_json_path: str, out_csv: str, root: str = DEFAULT_SWB_ROOT
) -> None:
    """Regenerate backchannels.csv from utterance_is_backchannel.json
    (phiresky provenance; dataset.py:218-262)."""
    import pandas as pd

    reader = SWBReader(root)
    data = read_json(bc_json_path)
    samples = []
    for utt_idx, label in data.items():
        if label == "non-bc":
            continue
        session = utt_idx.split("-")[0][2:-1]
        samples.append({"session": session, "utt_idx": utt_idx, "label": label})
    bcs = pd.DataFrame(samples)
    rows = []
    for session in bcs.session.unique():
        if session not in reader.session_to_path:
            continue
        dialog = reader.get_session(session)["dialog"]
        for _, bc in bcs[bcs.session == session].iterrows():
            hit = dialog[dialog["utt_idx"] == bc.utt_idx]
            if len(hit) == 0:
                continue
            row = hit.iloc[0].to_dict()
            row["bc_label"] = bc.label
            row["session"] = session
            rows.append(row)
    pd.DataFrame(rows).to_csv(out_csv, index=False)


class BackchannelDataset:
    """Fixed windows around backchannels: pre_context + post_context seconds,
    zero-padded at session edges (dataset.py:264-363)."""

    SPLITS = ("train", "val", "test", "all")

    def __init__(
        self,
        bc_csv: str,
        audio_root: str,
        split: str = "train",
        pre_context: float = 15.0,
        post_context: float = 5.0,
        sample_rate: int = 16_000,
        frame_hz: int = 50,
        root: str = DEFAULT_SWB_ROOT,
    ):
        import ast

        import pandas as pd

        self.reader = SWBReader(root)
        df = pd.read_csv(
            bc_csv,
            converters={
                "starts": ast.literal_eval,
                "ends": ast.literal_eval,
                "words": ast.literal_eval,
            },
        )
        if split != "all":
            sessions = set(int(s) for s in self.reader.split_sessions(split))
            df = df[df["session"].astype(int).isin(sessions)]
        self.df = df.reset_index(drop=True)

        self.audio_root = audio_root
        self.pre_context = pre_context
        self.post_context = post_context
        self.sample_rate = sample_rate
        self.frame_hz = frame_hz
        self.n_samples = time_to_samples(pre_context + post_context, sample_rate)

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> Dict:
        from voiceactivityprojection_tpu.ops.audio import get_audio_info, load_waveform

        utt = self.df.iloc[idx]
        audio_path = self.reader.session_to_audio_path(utt.session, self.audio_root)
        duration = get_audio_info(audio_path)["duration"]

        start_time = max(round(float(utt.start) - self.pre_context, 2), 0.0)
        end_time = min(round(float(utt.start) + self.post_context, 2), duration)

        w, _ = load_waveform(
            audio_path,
            start_time=start_time,
            end_time=end_time,
            sample_rate=self.sample_rate,
        )
        if w.shape[0] == 1:
            from voiceactivityprojection_tpu.ops.audio import mono_to_stereo

            w = mono_to_stereo(w)

        # left-pad if the window starts before the session, right-pad past
        # end: the zero padding puts the backchannel at pre_context seconds
        # in EVERY window (same placement as the reference's pad_pre,
        # backchannel/dataset.py:313-339)
        out = np.zeros((2, self.n_samples), dtype=np.float32)
        offset = time_to_samples(
            self.pre_context - (float(utt.start) - start_time), self.sample_rate
        )
        usable = min(w.shape[-1], self.n_samples - offset)
        out[:, offset : offset + usable] = w[:, :usable]

        # reference sample contract (backchannel/dataset.py:344-352):
        # integer speaker, bc start/end in seconds and frames. Two
        # deliberate deviations from reference bugs: (a) the reference
        # assigns bc_start_frame twice — the second is named bc_end_frame
        # here as clearly intended; (b) when clipped at session start the
        # reference reports bc_start_time=utt.start although its own
        # padding places the bc at pre_context — we report the position
        # that matches the returned waveform
        rel_bc_start = self.pre_context
        utt_end = float(utt["end"]) if "end" in utt else float(utt["ends"][-1])
        utt_duration = utt_end - float(utt.start)
        hop = 1.0 / self.frame_hz
        return {
            "waveform": out,
            "speaker": 0 if str(utt.get("speaker", "A")) == "A" else 1,
            "bc_start_time": rel_bc_start,
            "bc_start_frame": time_to_frames(rel_bc_start, hop),
            "bc_end_time": rel_bc_start + utt_duration,
            "bc_end_frame": time_to_frames(rel_bc_start + utt_duration, hop),
            "label": utt.get("bc_label", ""),
            "session": str(utt.session),
            "utt_idx": utt.utt_idx,
        }
