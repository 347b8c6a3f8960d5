"""Prosody analysis/manipulation probes (reference: vap/phrases/functional.py).

The reference round-trips through praat (parselmouth) for pitch tracking,
flat-F0/shifted-F0 resynthesis and intensity flattening
(functional.py:28-310). parselmouth is not available in this image, so the
probes are implemented as plain DSP:

* `pitch_track`   — autocorrelation F0 estimation (25 ms window / 10 ms
  hop, 60-400 Hz search band, voicing threshold) — the praat AC method's
  core without octave-cost dynamic programming.
* `flatten_pitch` / `shift_pitch` — TD-PSOLA: pitch marks from the F0
  track, Hann-windowed two-period grains, overlap-add at the target pitch
  spacing (praat's "Change gender"/resynthesis analogue).
* `flatten_intensity` — frame-gain equalization toward the mean RMS of
  voiced/active frames (functional.py intensity_praat_flatten analogue).
* `low_pass_filter_resample` — EXACT port of the reference trick: resample
  down to 2*cutoff then back up (functional.py:239-245).
* `duration_avg` — per-segment uniform time-scaling via polyphase resample
  given alignment segments (duration_avg permutation of the phrases eval).

These match the reference's *purpose* (perturb one prosodic dimension at a
time for the SIGDIAL-2022 probing analysis), not praat bit-for-bit.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def frame_signal(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    if len(x) < frame_len:  # short input: one zero-padded frame, not a crash
        x = np.pad(x, (0, frame_len - len(x)))
    n = 1 + (len(x) - frame_len) // hop
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def frame_rms(x: np.ndarray, frame_len: int = 400, hop: int = 160) -> np.ndarray:
    f = frame_signal(np.asarray(x, dtype=np.float32), frame_len, hop)
    return np.sqrt((f ** 2).mean(-1) + 1e-12)


def pitch_track(
    x: np.ndarray,
    sample_rate: int = 16_000,
    hop_time: float = 0.01,
    fmin: float = 60.0,
    fmax: float = 400.0,
    voiced_threshold: float = 0.3,
    n_candidates: int = 4,
    jump_cost: float = 0.5,
    voicing_transition_cost: float = 0.14,
    octave_cost: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Candidate-based autocorrelation pitch with Viterbi path smoothing
    (the praat algorithm family: per-frame peak candidates + an unvoiced
    hypothesis, octave-jump transition costs, best global path). Returns
    (f0, voiced_mask) per hop frame; f0=0 for unvoiced frames.

    Chosen over single-peak autocorr after measuring the probe chain on
    the reference example wav (tests/test_prosody.py): single-peak octave
    errors inflated the flattened-pitch residual std to 6.7 Hz; the
    Viterbi path brings it to ~2.1 Hz (tracker floor on clean synthetic
    flat pitch: 0.6 Hz). `voiced_threshold` acts as the unvoiced state's
    local cost (strength below it prefers unvoiced, like praat's
    voicing_threshold)."""
    x = np.asarray(x, dtype=np.float32)
    hop = int(hop_time * sample_rate)
    frame_len = int(0.025 * sample_rate)
    lag_min = int(sample_rate / fmax)
    lag_max = min(int(sample_rate / fmin), frame_len - 1)

    frames = frame_signal(x, frame_len, hop)
    frames = frames - frames.mean(-1, keepdims=True)
    # full autocorrelation via FFT
    nfft = 1 << (2 * frame_len - 1).bit_length()
    spec = np.fft.rfft(frames, nfft)
    ac = np.fft.irfft(spec * np.conj(spec), nfft)[:, :frame_len]
    ac0 = np.maximum(ac[:, 0], 1e-10)
    norm_ac = ac / ac0[:, None]
    # taper-bias correction (praat's r(tau)/r_w(tau)): the raw estimator
    # decays ~(1 - lag/frame_len) for a perfectly periodic signal, which
    # starves low-f0 candidates (a pure 100 Hz tone read ~0.6 at its lag).
    # The correction factor is capped (x3) and the result NOT clipped at
    # 1: clipping saturates whole lag plateaus to exactly 1.0, which ties
    # subharmonics with the true peak and pushes it out of the top-N
    # candidate list (observed: a pure 330 Hz tone tracked at 165 Hz).
    taper = np.maximum(1.0 - np.arange(frame_len) / frame_len, 1.0 / 3.0)
    norm_ac = norm_ac / taper[None, :]
    energy = ac0 / frame_len

    T = len(frames)
    if T == 0:  # sub-frame input: no frames, no pitch (no crash)
        return np.zeros(0, np.float32), np.zeros(0, bool)
    band = norm_ac[:, lag_min : lag_max + 1]
    nc = n_candidates
    cands = np.zeros((T, nc), dtype=np.float64)     # candidate f0 (0 = none)
    strengths = np.zeros((T, nc), dtype=np.float64)  # autocorr peak height
    # local maxima of the lag band, top-nc by strength, sub-sample refined
    interior = band[:, 1:-1]
    is_peak = (interior > band[:, :-2]) & (interior >= band[:, 2:])
    lag_axis = np.arange(band.shape[1]) + lag_min
    f0_axis = sample_rate / lag_axis
    # candidate selection score includes the octave penalty (praat applies
    # OctaveCost when scoring candidates, not only on the path): for a
    # pure tone every subharmonic lag reads corrected-strength ~1.0, so a
    # raw-strength top-N fills up with subharmonics and drops the true
    # peak entirely (observed at 330 Hz with a 400-sample frame)
    sel_pen = octave_cost * np.log2(fmax / f0_axis)
    for i in range(T):
        pk = np.nonzero(is_peak[i])[0] + 1
        if pk.size == 0:
            continue
        top = pk[np.argsort(band[i, pk] - sel_pen[pk])[::-1][:nc]]
        lags = top + lag_min
        y0 = norm_ac[i, lags - 1]
        y1 = norm_ac[i, lags]
        y2 = norm_ac[i, np.minimum(lags + 1, frame_len - 1)]
        den = y0 - 2 * y1 + y2
        delta = np.where(np.abs(den) > 1e-8, 0.5 * (y0 - y2) / np.where(np.abs(den) > 1e-8, den, 1.0), 0.0)
        lag_f = lags + np.clip(delta, -1, 1)
        k = len(top)
        cands[i, :k] = sample_rate / np.maximum(lag_f, 1.0)
        strengths[i, :k] = band[i, top]

    # Viterbi over nc pitch states + 1 unvoiced state
    NS = nc + 1
    local = np.full((T, NS), np.inf)
    # octave cost (praat's OctaveCost): after taper correction a pure
    # tone's subharmonic peak ties the true one — penalize low f0 so the
    # higher octave wins ties
    oct_pen = octave_cost * np.where(
        cands > 0, np.log2(fmax / np.maximum(cands, 1e-6)), 0.0
    )
    # corrected strengths can exceed 1 (noise amplified by the taper
    # correction); cost floors at the octave penalty so super-unity
    # strengths don't become negative costs
    local[:, :nc] = np.where(
        strengths > 0, 1.0 - np.minimum(strengths, 1.0) + oct_pen, np.inf
    )
    local[:, nc] = voiced_threshold
    logf = np.where(cands > 0, np.log2(np.maximum(cands, 1e-6)), 0.0)
    cost = local[0].copy()
    back = np.zeros((T, NS), dtype=np.int32)
    for i in range(1, T):
        # transition matrix prev(k) x cur(j)
        tr = np.zeros((NS, NS))
        valid_prev = cands[i - 1] > 0
        valid_cur = cands[i] > 0
        dj = np.abs(logf[i - 1][:, None] - logf[i][None, :])
        tr[:nc, :nc] = np.where(
            valid_prev[:, None] & valid_cur[None, :], jump_cost * dj, np.inf
        )
        tr[nc, :nc] = voicing_transition_cost
        tr[:nc, nc] = voicing_transition_cost
        tr[nc, nc] = 0.0
        tot = cost[:, None] + tr
        back[i] = np.argmin(tot, axis=0)
        cost = tot[back[i], np.arange(NS)] + local[i]
        cost = np.where(np.isfinite(local[i]), cost, np.inf)

    path = np.zeros(T, dtype=np.int32)
    path[-1] = int(np.argmin(cost))
    for i in range(T - 2, -1, -1):
        path[i] = back[i + 1, path[i + 1]]

    sel = path < nc
    f0 = np.where(sel, cands[np.arange(T), np.minimum(path, nc - 1)], 0.0)
    voiced = sel & (f0 > 0) & (energy > 1e-6)
    f0 = np.where(voiced, f0, 0.0)
    return f0.astype(np.float32), voiced


def _pitch_marks(
    x: np.ndarray, f0: np.ndarray, voiced: np.ndarray, sample_rate: int, hop: int
) -> List[int]:
    """Sequential glottal-epoch placement from the F0 contour."""
    marks: List[int] = []
    t = 0
    n = len(x)
    default_period = int(sample_rate / 150)
    while t < n:
        fi = min(t // hop, len(f0) - 1)
        if voiced[fi] and f0[fi] > 0:
            period = int(round(sample_rate / f0[fi]))
        else:
            period = default_period
        marks.append(t)
        t += max(period, 8)
    return marks


def _psola(
    x: np.ndarray,
    f0: np.ndarray,
    voiced: np.ndarray,
    target_f0: np.ndarray,
    sample_rate: int = 16_000,
    hop_time: float = 0.01,
) -> np.ndarray:
    """TD-PSOLA resynthesis toward target_f0 (same frame grid as f0)."""
    x = np.asarray(x, dtype=np.float32)
    hop = int(hop_time * sample_rate)
    marks = _pitch_marks(x, f0, voiced, sample_rate, hop)
    out = np.zeros_like(x)
    norm = np.zeros_like(x) + 1e-8
    n = len(x)

    t_out = 0.0
    mi = 0
    while t_out < n and mi < len(marks):
        # advance analysis mark closest to synthesis time
        while mi + 1 < len(marks) and marks[mi + 1] <= t_out:
            mi += 1
        m = marks[mi]
        fi = min(m // hop, len(f0) - 1)
        if voiced[fi] and f0[fi] > 0:
            src_period = int(round(sample_rate / f0[fi]))
            tgt = target_f0[min(int(t_out) // hop, len(target_f0) - 1)]
            tgt_period = src_period if tgt <= 0 else int(round(sample_rate / tgt))
        else:
            src_period = int(sample_rate / 150)
            tgt_period = src_period

        g0 = max(m - src_period, 0)
        g1 = min(m + src_period, n)
        grain = x[g0:g1]
        win = np.hanning(len(grain)).astype(np.float32)
        o0 = int(t_out) - (m - g0)
        lo = max(o0, 0)
        hi = min(o0 + len(grain), n)
        if hi > lo:
            gs = lo - o0
            out[lo:hi] += grain[gs : gs + hi - lo] * win[gs : gs + hi - lo]
            norm[lo:hi] += win[gs : gs + hi - lo]
        t_out += max(tgt_period, 8)

    return (out / norm).astype(np.float32)


def flatten_pitch(
    x: np.ndarray,
    target_f0: Optional[float] = None,
    sample_rate: int = 16_000,
    hop_time: float = 0.01,
) -> np.ndarray:
    """Resynthesize with constant F0 (mean voiced F0 unless given) —
    analogue of pitch_praat_flatten (functional.py)."""
    f0, voiced = pitch_track(x, sample_rate, hop_time)
    if not voiced.any():
        return np.asarray(x, dtype=np.float32)
    mean_f0 = float(target_f0 or f0[voiced].mean())
    tgt = np.where(voiced, mean_f0, 0.0)
    return _psola(x, f0, voiced, tgt, sample_rate, hop_time)


def shift_pitch(
    x: np.ndarray,
    factor: float,
    sample_rate: int = 16_000,
    hop_time: float = 0.01,
) -> np.ndarray:
    """Multiply the F0 contour by `factor`, preserving duration/formant-ish
    structure — analogue of pitch_praat_shift."""
    f0, voiced = pitch_track(x, sample_rate, hop_time)
    tgt = np.where(voiced, f0 * factor, 0.0)
    return _psola(x, f0, voiced, tgt, sample_rate, hop_time)


def flatten_intensity(
    x: np.ndarray,
    sample_rate: int = 16_000,
    hop_time: float = 0.01,
    min_activity_rms: float = 1e-3,
) -> np.ndarray:
    """Equalize frame energy toward the mean active RMS."""
    x = np.asarray(x, dtype=np.float32)
    hop = int(hop_time * sample_rate)
    frame_len = int(0.025 * sample_rate)
    rms = frame_rms(x, frame_len, hop)
    active = rms > min_activity_rms
    if not active.any():
        return x
    target = rms[active].mean()
    gains = np.where(active, target / np.maximum(rms, 1e-8), 1.0)
    # per-sample gain by linear interpolation of frame gains
    ts = hop * np.arange(len(gains)) + frame_len // 2
    g = np.interp(np.arange(len(x)), ts, gains)
    return (x * g).astype(np.float32)


def low_pass_filter_resample(
    x: np.ndarray, cutoff_freq: int = 400, sample_rate: int = 16_000
) -> np.ndarray:
    """Resample to 2*cutoff and back (EXACT reference trick,
    functional.py:239-245) — removes all content above `cutoff_freq`."""
    from voiceactivityprojection_tpu.ops.audio import resample

    inter = resample(np.asarray(x, dtype=np.float32), sample_rate, 2 * cutoff_freq)
    y = resample(inter, 2 * cutoff_freq, sample_rate)
    n = np.asarray(x).shape[-1]
    if y.shape[-1] < n:
        y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, n - y.shape[-1])])
    return y[..., :n]


# ---------------------------------------------------------------------------
# batch-module wrappers (API parity with vap/phrases/transforms.py:28-163 —
# callables over (B, C, n_samples) batches, looping per sample/channel like
# the reference nn.Module wrappers)
# ---------------------------------------------------------------------------
class _BatchTransform:
    def _one(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def __call__(self, waveform: np.ndarray, vad=None) -> np.ndarray:
        waveform = np.asarray(waveform, dtype=np.float32)
        assert waveform.ndim == 3, f"expected (B, C, n), got {waveform.shape}"
        out = np.empty_like(waveform)
        for b in range(waveform.shape[0]):
            for c in range(waveform.shape[1]):
                out[b, c] = self._one(waveform[b, c])
        return out


class FlatPitch(_BatchTransform):
    def __init__(self, target_f0: float = -1, sample_rate: int = 16_000,
                 hop_time: float = 0.01):
        self.target_f0 = None if target_f0 <= 0 else target_f0
        self.sample_rate = sample_rate
        self.hop_time = hop_time

    def _one(self, x):
        return flatten_pitch(x, self.target_f0, self.sample_rate, self.hop_time)


class ShiftPitch(_BatchTransform):
    def __init__(self, factor: float = 0.9, sample_rate: int = 16_000,
                 hop_time: float = 0.01):
        self.factor = factor
        self.sample_rate = sample_rate
        self.hop_time = hop_time

    def _one(self, x):
        return shift_pitch(x, self.factor, self.sample_rate, self.hop_time)


class FlatIntensity(_BatchTransform):
    def __init__(self, sample_rate: int = 16_000, hop_time: float = 0.01):
        self.sample_rate = sample_rate
        self.hop_time = hop_time

    def _one(self, x):
        return flatten_intensity(x, self.sample_rate, self.hop_time)


class LowPass(_BatchTransform):
    def __init__(self, cutoff_freq: int = 400, sample_rate: int = 16_000):
        self.cutoff_freq = cutoff_freq
        self.sample_rate = sample_rate

    def _one(self, x):
        return low_pass_filter_resample(x, self.cutoff_freq, self.sample_rate)


def duration_avg(
    x: np.ndarray,
    segments: List[Tuple[float, float]],
    sample_rate: int = 16_000,
) -> np.ndarray:
    """Uniform per-segment time-scaling: every segment is resampled to the
    mean segment duration (duration-flattening permutation of the phrases
    evaluation). segments: [(start_s, end_s), ...] must be ordered."""
    from voiceactivityprojection_tpu.ops.audio import resample

    x = np.asarray(x, dtype=np.float32)
    if not segments:
        return x
    durs = [e - s for s, e in segments]
    mean_dur = float(np.mean(durs))
    mean_n = int(round(mean_dur * sample_rate))
    parts = []
    cursor = 0
    for (s, e) in segments:
        s_i, e_i = int(s * sample_rate), int(e * sample_rate)
        if s_i > cursor:
            parts.append(x[cursor:s_i])
        seg = x[s_i:e_i]
        if len(seg) > 1:
            # rational approximation of the stretch factor
            up, down = mean_n, max(len(seg), 1)
            stretched = resample(seg, down * 100, up * 100)
            parts.append(stretched)
        cursor = e_i
    if cursor < len(x):
        parts.append(x[cursor:])
    return np.concatenate(parts).astype(np.float32)


def f0_statistics(f0: np.ndarray, voiced: Optional[np.ndarray] = None):
    """(mean, std, voiced_ratio) over voiced frames — analogue of the
    reference's f0_statistics helper (vap/phrases/functional.py)."""
    f0 = np.asarray(f0)
    if voiced is None:
        voiced = f0 > 0
    if not voiced.any():
        return 0.0, 0.0, 0.0
    v = f0[voiced]
    return float(v.mean()), float(v.std()), float(voiced.mean())
