"""Data pipeline implementing the reference's external-DataModule contract.

The reference's training data module lives in a private repo (imported at
vap/train.py:21); its batch contract is documented in README.md:35-42:

    batch["waveform"]: (B, 2, n_samples)            # 20 s @ 16 kHz stereo
    batch["vad"]:      (B, n_frames + horizon, 2)   # 1100 frames @ 50 Hz

This module supplies that contract from a CSV manifest with columns:

    audio_path,vad_path[,start,end]

where `vad_path` is a vad_list JSON ([[ [s,e], ...] x2], like
example/*_vad_list.json) and start/end optionally crop the session.
`SlidingWindowDataset` slices each session into fixed `audio_duration`
windows with `horizon` extra seconds of VAD. `VapDataLoader` batches with
optional shuffling and a background prefetch thread (host-side NumPy; the
device never sees ragged shapes).
"""

from __future__ import annotations

import csv as _csv
import queue
import threading
from typing import Dict, Iterator, List

import numpy as np

import functools

from voiceactivityprojection_tpu.ops.audio import load_waveform, mono_to_stereo
from voiceactivityprojection_tpu.ops.vad import vad_list_to_onehot, get_vad_list_subset
from voiceactivityprojection_tpu.utils.io import read_json


@functools.lru_cache(maxsize=None)
def _read_vad_list(path: str):
    """Sessions are read-only and each yields many windows — parse the
    (potentially multi-thousand-segment) vad JSON once, not per window.

    Unbounded on purpose: a bounded LRU sized below the corpus thrashes
    under shuffled access (every window misses once the session count
    exceeds the cap — observed as a silent trap at the 400-session scale).
    Parsed vad lists are small (tens of KB per hour of dialog), so even a
    10k-session corpus stays well under a GB; `clear_vad_cache()` is the
    explicit release valve for long-lived processes that cycle corpora."""
    return read_json(path)


def clear_vad_cache() -> None:
    _read_vad_list.cache_clear()


class SlidingWindowDataset:
    """Fixed-duration windows over sessions listed in a CSV manifest."""

    def __init__(
        self,
        csv_path: str,
        audio_duration: float = 20.0,
        horizon: float = 2.0,
        sample_rate: int = 16_000,
        frame_hz: int = 50,
        overlap: float = 0.0,
        mono: bool = False,
        va_history: bool = False,
        va_history_times: tuple = (60.0, 30.0, 10.0, 5.0),
    ):
        self.audio_duration = audio_duration
        self.horizon = horizon
        self.sample_rate = sample_rate
        self.frame_hz = frame_hz
        self.mono = mono
        # mono-model conditioning feature (reference vad_history, the
        # external DataModule contract of vap/train_mono.py:156-163):
        # speaker-0 activity ratio over trailing windows, computed from the
        # SESSION-level vad so the 60 s history reaches beyond the window
        self.va_history = va_history
        self.va_history_frames = tuple(
            int(round(t * frame_hz)) for t in va_history_times
        )
        self.n_samples = int(audio_duration * sample_rate)
        self.n_frames = int((audio_duration + horizon) * frame_hz)

        step = audio_duration - overlap
        assert step > 0, "overlap must be smaller than audio_duration"

        self.windows: List[Dict] = []
        with open(csv_path) as f:
            for row in _csv.DictReader(f):
                start = float(row.get("start") or 0.0)
                if row.get("end"):
                    end = float(row["end"])
                else:
                    from voiceactivityprojection_tpu.ops.audio import get_audio_info

                    end = get_audio_info(row["audio_path"])["duration"]
                t = start
                while t + audio_duration <= end:
                    self.windows.append(
                        {
                            "audio_path": row["audio_path"],
                            "vad_path": row["vad_path"],
                            "start": t,
                            "end": t + audio_duration,
                        }
                    )
                    t += step

    def __len__(self) -> int:
        return len(self.windows)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        w = self.windows[idx]
        x, _ = load_waveform(
            w["audio_path"],
            sample_rate=self.sample_rate,
            start_time=w["start"],
            end_time=w["end"],
            mono=self.mono,  # mixdown for the mono model's 1-channel input
        )
        if x.shape[0] == 1 and not self.mono:
            x = mono_to_stereo(x)
        if x.shape[-1] < self.n_samples:  # zero-pad ragged session tails
            pad = self.n_samples - x.shape[-1]
            x = np.pad(x, [(0, 0), (0, pad)])
        x = x[:, : self.n_samples]

        vad_list = _read_vad_list(w["vad_path"])
        sub = get_vad_list_subset(vad_list, w["start"], w["end"] + self.horizon)
        vad = vad_list_to_onehot(
            sub, duration=self.audio_duration + self.horizon, frame_hz=self.frame_hz
        )
        if vad.shape[0] < self.n_frames:
            vad = np.pad(vad, [(0, self.n_frames - vad.shape[0]), (0, 0)])
        vad = vad[: self.n_frames]

        item = {
            "waveform": x.astype(np.float32),
            "vad": vad.astype(np.float32),
            "session": w["audio_path"],
        }
        if self.va_history:
            from voiceactivityprojection_tpu.ops.vad import get_activity_history

            # extend the context back by the longest history window so the
            # feature at the window's first frames sees the real past
            reach = self.va_history_frames[0] / self.frame_hz
            ext_start = max(0.0, w["start"] - reach)
            ext = get_vad_list_subset(
                vad_list, ext_start, w["end"] + self.horizon
            )
            ext_vad = vad_list_to_onehot(
                ext,
                duration=(w["end"] + self.horizon) - ext_start,
                frame_hz=self.frame_hz,
            )
            hist = get_activity_history(ext_vad, self.va_history_frames)
            off = int(round((w["start"] - ext_start) * self.frame_hz))
            vah = hist[off : off + self.n_frames]
            if vah.shape[0] < self.n_frames:  # ragged session tail
                vah = np.pad(
                    vah,
                    [(0, self.n_frames - vah.shape[0]), (0, 0)],
                    constant_values=0.5,
                )
            item["vah"] = vah.astype(np.float32)
        return item


class VapDataLoader:
    """Batched iteration with shuffle + background prefetch."""

    def __init__(
        self,
        dataset: SlidingWindowDataset,
        batch_size: int = 16,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.num_workers = num_workers

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor

        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)

        def load_batch(idxs, pool):
            # audio decode + polyphase resample release the GIL in the
            # native library, so threads give real wall-clock speedup
            items = list(pool.map(lambda j: self.dataset[int(j)], idxs))
            batch = {
                "waveform": np.stack([it["waveform"] for it in items]),
                "vad": np.stack([it["vad"] for it in items]),
            }
            if "vah" in items[0]:
                batch["vah"] = np.stack([it["vah"] for it in items])
            return batch

        with ThreadPoolExecutor(max_workers=max(self.num_workers, 1)) as pool:
            for i in range(0, len(order), self.batch_size):
                idxs = order[i : i + self.batch_size]
                if self.drop_last and len(idxs) < self.batch_size:
                    break
                yield load_batch(idxs, pool)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        DONE = object()
        stop = threading.Event()

        def put(item) -> bool:
            # blocking put that aborts when the consumer went away — a
            # consumer breaking out early (limit_batches, early stop) must
            # not leave the worker blocked on a full queue forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._batches():
                    if not put(b):
                        return
            finally:
                put(DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    break
                yield item
        finally:
            stop.set()
            try:  # unblock a worker mid-put
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)


def write_manifest(rows: List[Dict[str, str]], path: str) -> None:
    """Helper: write an audio/vad manifest CSV."""
    fields = ["audio_path", "vad_path", "start", "end"]
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        for r in rows:
            w.writerow({k: r.get(k, "") for k in fields})
