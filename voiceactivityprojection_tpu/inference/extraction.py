"""Offline extraction for arbitrarily long audio.

Reference behavior (run.py:23-131, vap/extraction.py:99-270): audio longer
than ~160 s is processed as 25 s chunks (20 s context + 5 s step); the
first chunk keeps all frames, later chunks contribute their last 5 s, and
the tail re-runs the final 25 s window keeping only uncovered frames.

TPU-first changes:
* every chunk has the SAME static shape -> exactly one XLA compilation;
* chunks are stacked and run through the model in BATCHES (default 8)
  instead of the reference's one-by-one Python loop — the MXU sees
  (B, T, C) matmuls and per-chunk dispatch overhead amortizes;
* stitching happens host-side on NumPy slices.

Outputs mirror `VapExtractor.get_minimal_output_*` (vap/extraction.py:83-96):
p_now / p_future take the channel-0 slice, plus model VAD per channel, H,
and optional per-frame loss when ground-truth VAD is supplied.
"""

from __future__ import annotations

import csv
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from voiceactivityprojection_tpu.models.vap import VapModel
from voiceactivityprojection_tpu.ops.audio import mono_to_stereo
from voiceactivityprojection_tpu.utils.io import write_json

# auto-chunk threshold (vap/extraction.py:13: 160 s on a 24 GB GPU; kept for
# behavioral parity — the flash-attention path could go far longer)
MAX_SINGLE_SHOT_TIME = 160.0


class VapExtractor:
    def __init__(
        self,
        model: VapModel,
        context_time: float = 20.0,
        step_time: float = 5.0,
        chunk_batch: int = 8,
    ):
        self.model = model
        self.context_time = context_time
        self.step_time = step_time
        self.chunk_batch = chunk_batch

        sr = model.conf.sample_rate
        hz = model.conf.frame_hz
        self.chunk_time = context_time + step_time
        self.chunk_samples = int(self.chunk_time * sr)
        self.step_samples = int(step_time * sr)
        self.chunk_frames = int(self.chunk_time * hz)
        self.step_frames = int(step_time * hz)

    # ------------------------------------------------------------------
    def _probs_np(self, waveform: np.ndarray, vad=None) -> Dict[str, np.ndarray]:
        out = self.model.probs(jnp.asarray(waveform), vad=vad)
        return {k: np.asarray(v) for k, v in out.items()}

    def extract(
        self, waveform: np.ndarray, vad: Optional[np.ndarray] = None
    ) -> Dict[str, np.ndarray]:
        """waveform: (2, n) or (1, n) (silent channel added) or (B, 2, n)
        with B == 1. Returns stitched output dict with (1, T, ...) arrays."""
        waveform = np.asarray(waveform, dtype=np.float32)
        if waveform.ndim == 2:
            waveform = waveform[None]
        waveform = mono_to_stereo(waveform)
        assert waveform.shape[0] == 1 and waveform.shape[1] == 2, (
            f"expected single stereo signal, got {waveform.shape}"
        )
        n = waveform.shape[-1]
        duration = n / self.model.conf.sample_rate
        # reference threshold (vap/extraction.py:13,264-265): single shot up
        # to 160 s, step extraction only beyond — NOT at chunk_time, which
        # would give frames past 25 s only a rolling 20 s context
        if duration <= MAX_SINGLE_SHOT_TIME:
            return self._probs_np(waveform, vad=vad)
        return self.step_extraction(waveform, vad=vad)

    # ------------------------------------------------------------------
    def step_extraction(
        self, waveform: np.ndarray, vad: Optional[np.ndarray] = None
    ) -> Dict[str, np.ndarray]:
        """Sliding-window extraction with batched chunk inference."""
        sr = self.model.conf.sample_rate
        hz = self.model.conf.frame_hz
        n = waveform.shape[-1]
        if n <= self.chunk_samples:
            # shorter than one chunk (e.g. --chunk forced on short audio):
            # a single full pass IS the chunked result
            return self._probs_np(waveform, vad=vad)

        # chunk start offsets: 0, step, 2*step, ... while start+chunk <= n
        starts = list(range(0, n - self.chunk_samples + 1, self.step_samples))
        covered = starts[-1] + self.chunk_samples  # samples covered so far
        tail_start: Optional[int] = None
        if covered < n:
            tail_start = n - self.chunk_samples  # re-run final full window

        chunks = [waveform[0, :, s : s + self.chunk_samples] for s in starts]
        if tail_start is not None:
            chunks.append(waveform[0, :, tail_start : tail_start + self.chunk_samples])
        stacked = np.stack(chunks)  # (n_chunks, 2, chunk_samples)

        # batched model passes, fixed batch shape (pad last batch)
        outs = []
        B = self.chunk_batch
        for i in range(0, len(stacked), B):
            group = stacked[i : i + B]
            pad = B - len(group)
            if pad:
                group = np.concatenate([group, np.zeros((pad, *group.shape[1:]), group.dtype)])
            o = self._probs_np(group)
            if pad:
                o = {k: v[:-pad] for k, v in o.items()}
            outs.append(o)
        merged = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

        # stitch: chunk 0 whole; others last step_frames; tail the remainder
        n_main = len(starts)
        stitched: Dict[str, list] = {k: [] for k in merged}
        for k, v in merged.items():
            parts = [v[0]]
            for c in range(1, n_main):
                parts.append(v[c][-self.step_frames :])
            if tail_start is not None:
                frames_done = self.chunk_frames + (n_main - 1) * self.step_frames
                total_frames = int(n / sr * hz)
                remain = total_frames - frames_done
                if remain > 0:
                    parts.append(v[n_main][-remain:])
            stitched[k] = np.concatenate(parts, axis=0)[None]

        if vad is not None:
            stitched["loss"] = self._stitched_loss(stitched["probs"], vad)
        return stitched

    def _stitched_loss(self, probs: np.ndarray, vad) -> np.ndarray:
        """Post-hoc per-frame loss on the stitched timeline, dispatched on
        the objective representation exactly like the single-shot path
        (models/vap.py get_probs). Logits are reconstructed from the
        stitched probabilities: log(p) for the softmax objective (CE is
        shift-invariant, log p is already normalized), logit(p) for the
        Bernoulli objectives."""
        conf = self.model.conf
        vad = jnp.asarray(vad)
        rep = conf.representation
        if rep == "discrete":
            from voiceactivityprojection_tpu.ops.codebook import get_labels
            from voiceactivityprojection_tpu.ops.losses import loss_vap

            labels = get_labels(vad, conf.bin_frames)
            T = min(probs.shape[1], labels.shape[1])
            logits = np.log(np.maximum(probs[:, :T], 1e-12))
            return np.asarray(
                loss_vap(jnp.asarray(logits), labels[:, :T], reduction="none")
            )

        from voiceactivityprojection_tpu.ops import objective_variants as ov

        p = np.clip(probs, 1e-7, 1.0 - 1e-7)
        logits = np.log(p) - np.log1p(-p)  # sigmoid^-1, elementwise
        if rep == "independent":
            labels = ov.get_labels_independent(vad, conf.bin_frames)
            T = min(logits.shape[1], labels.shape[1])
            return np.asarray(
                ov.loss_vap_independent(
                    jnp.asarray(logits[:, :T]), labels[:, :T], reduction="none"
                )
            )
        if rep == "comparative":
            labels = ov.get_labels_comparative(vad, conf.bin_frames)
            T = min(logits.shape[1], labels.shape[1])
            return np.asarray(
                ov.loss_vap_comparative(
                    jnp.asarray(logits[:, :T]), labels[:, :T], reduction="none"
                )
            )
        raise ValueError(f"unknown representation {rep!r}")

    # ------------------------------------------------------------------
    # minimal outputs (vap/extraction.py:83-96)
    # ------------------------------------------------------------------
    def get_minimal_output(self, out: Dict[str, np.ndarray]) -> Dict[str, list]:
        data: Dict[str, list] = {
            "p_now": out["p_now"][0, :, 0].tolist(),
            "p_future": out["p_future"][0, :, 0].tolist(),
            "model_vad0": out["vad"][0, :, 0].tolist(),
            "model_vad1": out["vad"][0, :, 1].tolist(),
            "H": out["H"][0].tolist(),
        }
        if "loss" in out:
            data["loss"] = out["loss"][0].tolist()
        return data

    def save_json(self, out: Dict[str, np.ndarray], path: str) -> None:
        write_json(self.get_minimal_output(out), path)

    def save_csv(self, out: Dict[str, np.ndarray], path: str) -> None:
        data = self.get_minimal_output(out)
        keys = list(data)
        # "loss" is horizon (~2 s of label frames) shorter than the other
        # columns; the reference pads it with 0 to full length instead of
        # truncating every column (vap/extraction.py json_data_to_df:63-80)
        n_rows = len(data["p_now"])
        cols = [data[k] + [0] * (n_rows - len(data[k])) for k in keys]
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(keys)
            for row in zip(*cols):
                w.writerow(row)
