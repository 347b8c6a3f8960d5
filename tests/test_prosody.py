"""Prosody DSP tests: pitch tracking accuracy on synthetic tones, PSOLA
flatten/shift effects, intensity flattening, low-pass, duration averaging.
Tolerances follow the intent of reference tests/test_functional.py (e.g.
flattened pitch std < 2 Hz on praat; ours asserts strong reduction)."""

import numpy as np
import pytest

from voiceactivityprojection_tpu.ops.prosody import (
    duration_avg,
    flatten_intensity,
    flatten_pitch,
    frame_rms,
    low_pass_filter_resample,
    pitch_track,
    shift_pitch,
)

pytestmark = pytest.mark.functional

SR = 16_000


def tone(freq, dur=1.0, amp=0.3):
    t = np.arange(int(dur * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def sweep(f0, f1, dur=1.0, amp=0.3):
    t = np.arange(int(dur * SR)) / SR
    phase = 2 * np.pi * (f0 * t + (f1 - f0) * t ** 2 / (2 * dur))
    return (amp * np.sin(phase)).astype(np.float32)


def voiced_mean_f0(x):
    f0, v = pitch_track(x)
    assert v.any()
    return f0[v].mean(), f0[v].std()


def test_pitch_track_pure_tone():
    for f in (100, 150, 220, 330):
        mean, std = voiced_mean_f0(tone(f))
        assert abs(mean - f) < 3.0, f"f={f} tracked {mean}"
        assert std < 2.0


def test_pitch_track_unvoiced_noise():
    rng = np.random.default_rng(0)
    x = (0.1 * rng.normal(size=SR)).astype(np.float32)
    f0, voiced = pitch_track(x)
    assert voiced.mean() < 0.4  # mostly unvoiced


def test_flatten_pitch_reduces_variation():
    x = sweep(120, 220)
    _, std_before = voiced_mean_f0(x)
    assert std_before > 15
    y = flatten_pitch(x)
    mean_after, std_after = voiced_mean_f0(y)
    assert std_after < std_before * 0.4, (std_before, std_after)
    # flattened toward the original mean
    mean_before, _ = voiced_mean_f0(x)
    assert abs(mean_after - mean_before) < 30


def test_shift_pitch_moves_mean():
    x = tone(150)
    up = shift_pitch(x, 1.2)
    mean_up, _ = voiced_mean_f0(up)
    assert mean_up > 160, mean_up
    down = shift_pitch(x, 0.8)
    mean_down, _ = voiced_mean_f0(down)
    assert mean_down < 140, mean_down


def test_flatten_intensity():
    x = np.concatenate([tone(150, 0.5, amp=0.05), tone(150, 0.5, amp=0.4)])
    rms_before = frame_rms(x)
    y = flatten_intensity(x)
    rms_after = frame_rms(y)
    active = rms_before > 1e-3
    cv_before = rms_before[active].std() / rms_before[active].mean()
    cv_after = rms_after[active].std() / rms_after[active].mean()
    assert cv_after < cv_before * 0.3, (cv_before, cv_after)


def test_low_pass_removes_high_band():
    x = tone(200) + tone(3000)
    y = low_pass_filter_resample(x, cutoff_freq=400)
    assert len(y) == len(x)
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(y), 1 / SR)
    hi = spec[freqs > 1000].max()
    lo = spec[(freqs > 150) & (freqs < 250)].max()
    assert hi < lo * 0.01


def test_duration_avg():
    x = np.concatenate([tone(150, 0.2), tone(250, 0.6)])
    segs = [(0.0, 0.2), (0.2, 0.8)]
    y = duration_avg(x, segs)
    # two segments -> both become ~0.4 s; total stays ~0.8 s
    assert abs(len(y) - len(x)) < SR // 10


def test_time_scale_psola_preserves_pitch():
    """Pitch-preserving TSM (the cue-isolated corpus depends on this):
    stretching by 1.5x changes duration, NOT the tracked F0 — while the
    resample-based duration_avg at the same stretch multiplies F0."""
    from voiceactivityprojection_tpu.ops.prosody import time_scale_psola

    x = tone(180, 0.6)
    y = time_scale_psola(x, 1.5)
    assert abs(len(y) - int(len(x) * 1.5)) <= 2
    mean, _ = voiced_mean_f0(y)
    assert abs(mean - 180) < 6.0, mean
    y2 = time_scale_psola(x, 0.7)
    assert abs(len(y2) - int(round(len(x) * 0.7))) <= 2
    mean2, _ = voiced_mean_f0(y2)
    assert abs(mean2 - 180) < 6.0, mean2


def test_duration_words_psola_equalizes_and_keeps_f0():
    from voiceactivityprojection_tpu.ops.prosody import duration_words_psola

    x = np.concatenate([tone(150, 0.2), tone(150, 0.1) * 0, tone(150, 0.6)])
    segs = [(0.0, 0.2), (0.3, 0.9)]
    y, new_segs = duration_words_psola(x, segs)
    durs = [e - s for s, e in new_segs]
    assert all(abs(d - 0.4) < 0.02 for d in durs), durs
    mean, _ = voiced_mean_f0(y)
    assert abs(mean - 150) < 6.0, mean


def test_short_input_no_crash():
    """Inputs shorter than one 25 ms frame yield one zero-padded frame
    instead of an IndexError."""
    import numpy as np
    from voiceactivityprojection_tpu.ops.prosody import frame_rms, pitch_track

    x = np.random.default_rng(0).normal(size=300).astype(np.float32)
    r = frame_rms(x)
    assert r.shape[0] >= 1 and np.isfinite(r).all()
    f0, voiced = pitch_track(x)
    assert f0.shape == voiced.shape
