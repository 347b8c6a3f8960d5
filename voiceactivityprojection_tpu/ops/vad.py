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
