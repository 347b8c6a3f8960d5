"""Voice-activity tensor algebra.

Two tiers:

* Device-side, fully vectorized morphology for the model-VAD path
  (``vad_fill_silences`` / ``vad_omit_spikes``). The reference loops over
  run-length islands in Python per batch element (vap/utils.py:239-272);
  here short-run detection is done with prefix/suffix scans of
  nearest-active-index, so the whole (B, T, 2) batch is one fused XLA op.

* Host-side NumPy run-length encoding (``find_island_idx_len``) for the
  irregular event-extraction layer (vap/utils.py:21-49), which is
  list-shaped and deliberately kept off-device (SURVEY.md §7.7).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from voiceactivityprojection_tpu.utils.units import time_to_frames

VadList = List[List[List[float]]]


# --------------------------------------------------------------------------
# dialog states
# --------------------------------------------------------------------------
def get_dialog_states(vad) -> jax.Array:
    """(..., 2) VAD -> (...,) state: 0=only A, 1=silence, 2=both, 3=only B
    (vap/utils.py:130-138: ``2*vad_B - vad_A + 1``)."""
    return (2 * vad[..., 1] - vad[..., 0]).astype(jnp.int32) + 1


def get_dialog_states_np(vad: np.ndarray) -> np.ndarray:
    return (2 * vad[..., 1] - vad[..., 0]).astype(np.int64) + 1


# --------------------------------------------------------------------------
# run-length encoding (host side)
# --------------------------------------------------------------------------
def find_island_idx_len(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RLE of a 1-D array: (start_indices, durations, values)
    (contract of vap/utils.py:21-49)."""
    x = np.asarray(x)
    assert x.ndim == 1
    n = len(x)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, x
    change = np.nonzero(x[1:] != x[:-1])[0]
    ends = np.concatenate([change, [n - 1]])
    starts = np.concatenate([[0], change + 1]).astype(np.int64)
    durs = ends - starts + 1
    return starts, durs.astype(np.int64), x[ends]


# --------------------------------------------------------------------------
# vectorized morphology (device side)
# --------------------------------------------------------------------------
def _prev_active_idx(active: jax.Array) -> jax.Array:
    """Per frame, index of the most recent frame with active==True (else -1).
    active: (..., T) boolean; scan along the last axis."""
    T = active.shape[-1]
    idx = jnp.arange(T, dtype=jnp.int32)
    marked = jnp.where(active, idx, -1)
    return jax.lax.associative_scan(jnp.maximum, marked, axis=-1)


def _next_active_idx(active: jax.Array) -> jax.Array:
    """Per frame, index of the next frame with active==True (else T)."""
    T = active.shape[-1]
    idx = jnp.arange(T, dtype=jnp.int32)
    marked = jnp.where(active, idx, T)
    axis = marked.ndim - 1  # rev requires a nonnegative axis index
    return jax.lax.associative_scan(jnp.minimum, marked, axis=axis, reverse=True)


def _fill_short_runs(x: jax.Array, value: float, max_len: int) -> jax.Array:
    """Replace runs of ``x == value`` with length <= max_len by 1-value.

    x: (..., T) binary along last axis. Boundary runs count their true length
    (matching the reference, which fills any short island incl. edges).
    """
    if max_len <= 0:
        return x
    in_run = x == value
    other = jnp.logical_not(in_run)
    prev_o = _prev_active_idx(other)
    next_o = _next_active_idx(other)
    run_len = next_o - prev_o - 1  # length of the run containing each frame
    fill = jnp.logical_and(in_run, run_len <= max_len)
    return jnp.where(fill, 1.0 - value, x)


def vad_fill_silences(
    vad: jax.Array, max_fill_time: float = 0.02, frame_hz: float = 50
) -> jax.Array:
    """Fill silences <= max_fill_time. vad: (..., T, 2) binary float
    (contract of vap/utils.py:239-254; round() frame conversion)."""
    max_fill_frame = round(max_fill_time * frame_hz)
    x = jnp.moveaxis(vad, -2, -1)  # (..., 2, T)
    x = _fill_short_runs(x, value=0.0, max_len=max_fill_frame)
    return jnp.moveaxis(x, -1, -2)


def vad_omit_spikes(
    vad: jax.Array, max_omit_time: float = 0.02, frame_hz: float = 50
) -> jax.Array:
    """Remove activity spikes <= max_omit_time (vap/utils.py:257-272)."""
    max_omit_frame = round(max_omit_time * frame_hz)
    x = jnp.moveaxis(vad, -2, -1)
    x = _fill_short_runs(x, value=1.0, max_len=max_omit_frame)
    return jnp.moveaxis(x, -1, -2)


# --------------------------------------------------------------------------
# vad_list <-> onehot (host side)
# --------------------------------------------------------------------------
def add_zero_channel(w: np.ndarray) -> np.ndarray:
    """Append a silent channel as speaker B (vap/utils.py:15-18);
    w: (..., 1, n_samples) -> (..., 2, n_samples)."""
    z = np.zeros_like(w)
    return np.concatenate([w, z], axis=-2)


def vad_list_to_onehot(
    vad_list: VadList,
    duration: float,
    hop_time: float = 0,
    frame_hz: float = 0,
    channel_first: bool = False,
) -> np.ndarray:
    """(contract of vap/utils.py:170-195)."""
    assert hop_time > 0 or frame_hz > 0
    if frame_hz > 0:
        hop_time = 1 / frame_hz
    n_frames = time_to_frames(duration, hop_time)
    vad = np.zeros((n_frames, 2), dtype=np.float32)
    for ch, ch_vad in enumerate(vad_list):
        for s_t, e_t in ch_vad:
            s = time_to_frames(s_t, hop_time)
            e = time_to_frames(e_t, hop_time)
            vad[s:e, ch] = 1.0
    if channel_first:
        vad = vad.T
    return vad


def get_activity_history(
    vad: np.ndarray, bin_end_frames: Tuple[int, ...]
) -> np.ndarray:
    """VAD-history conditioning feature for the mono model
    (vap/model.py:354-359 consumes it; the reference's EXTERNAL DataModule
    produces it — vap/train_mono.py:156-163 batch contract, key
    ``vad_history`` in vap/phrases/evaluation_phrases.py:339-349).

    For each frame t, the ratio of SPEAKER 0's voice activity inside
    ``len(bin_end_frames) + 1`` trailing windows delimited by the (strictly
    decreasing) boundary offsets ``bin_end_frames`` (in frames before t):

      window 0                : [0, t - b0]            (all older context)
      window j (0 < j < k)    : (t - b_{j-1}, t - b_j]
      window k                : (t - b_{k-1}, t]       (most recent)

    Windows with zero total activity get the uninformative ratio 0.5.
    With the default 50 Hz times (60, 30, 10, 5) s this is the 5-bin
    feature matching VapMonoConfig.va_history_bins = 5. Flipping the
    speakers maps the feature to 1 - h on active windows (tested).

    vad: (T, 2) one-hot -> (T, k + 1) float32.
    """
    vad = np.asarray(vad, dtype=np.float64)
    assert vad.ndim == 2 and vad.shape[1] == 2, f"expected (T, 2), got {vad.shape}"
    b = [int(x) for x in bin_end_frames]
    assert all(x > 0 for x in b) and all(
        a > c for a, c in zip(b, b[1:])
    ), f"bin_end_frames must be positive strictly decreasing, got {b}"
    T = vad.shape[0]
    cs = np.cumsum(vad, axis=0)  # inclusive prefix sums per speaker

    def shifted(offset: int) -> np.ndarray:
        """cs[t - offset] with cs[<0] = 0."""
        if offset <= 0:
            return cs
        out = np.zeros_like(cs)
        if offset < T:
            out[offset:] = cs[:-offset]
        return out

    edges = [shifted(x) for x in b] + [cs]  # window right edges, oldest->now
    sums = [edges[0]] + [r - l for l, r in zip(edges[:-1], edges[1:])]
    acts = np.stack(sums, axis=1)  # (T, k+1, 2)
    total = acts.sum(-1)
    ratio = np.where(total > 0, acts[..., 0] / np.maximum(total, 1e-9), 0.5)
    return ratio.astype(np.float32)


def vad_onehot_to_vad_list(
    vad: np.ndarray, frame_hz: int = 50, ipu_thresh_time: float = 0.1
) -> List[VadList]:
    """(B, T, 2) -> per-batch [[ [s,e], ...] x2], merging gaps < ipu_thresh_time
    (vap/utils.py:198-236)."""
    vad = np.asarray(vad)
    assert vad.ndim == 3, f"expected (B, T, 2), got {vad.shape}"
    out: List[VadList] = []
    for b in range(vad.shape[0]):
        vl: VadList = []
        for ch in range(2):
            idx, dur, val = find_island_idx_len(vad[b, :, ch])
            on = val == 1
            starts = idx[on] / frame_hz
            ends = (idx[on] + dur[on]) / frame_hz
            merged: List[List[float]] = []
            for s, e in zip(starts, ends):
                s, e = round(float(s), 2), round(float(e), 2)
                if merged and s - merged[-1][1] < ipu_thresh_time:
                    merged[-1][1] = e
                else:
                    merged.append([s, e])
            vl.append(merged)
        out.append(vl)
    return out


def get_vad_list_subset(
    vad_list: VadList, start_time: float, end_time: float
) -> VadList:
    """Clip a vad_list to [start_time, end_time] in relative time
    (vap/utils.py:141-167)."""
    duration = end_time - start_time
    subset: VadList = [[], []]
    for ch, segs in enumerate(vad_list):
        for s, e in segs:
            if e < start_time:
                continue
            if s > end_time:
                break
            rs = round(s - start_time, 2)
            re = round(e - start_time, 2)
            subset[ch].append([max(rs, 0.0), min(re, duration)])
    return subset
