"""Prosody probes anchored to the reference's numeric expectations.

The reference validates its praat probes on the example wav
(reference tests/test_functional.py:28-75): flattened pitch must keep the
mean within 2 Hz and drop the std under 2 Hz; a 0.9x shift must land the
mean within 2 Hz of 0.9*mean and keep the std within 5 Hz; intensity
flattening must reduce the waveform std. This file ports those
expectations onto ops/prosody.py using the SAME wav.

ALL reference bounds are asserted AS-IS, including the flattened-pitch
residual std < 2.0 Hz that round 2 could only meet at 2.5: the tracker is
now Boersma's algorithm with praat's defaults and the PSOLA resynthesis
uses cc-aligned epochs + target-period grain resampling + unvoiced
passthrough. Measured on this wav: flat residual std 0.82 Hz (praat bound
2.0), flat mean d 0.03, shift mean d 0.54, shift std d 3.48.
"""

import os

import numpy as np
import pytest

pytestmark = [pytest.mark.functional]

WAV = "/root/reference/example/student_long_female_en-US-Wavenet-G.wav"

needs_wav = pytest.mark.skipif(not os.path.isfile(WAV), reason="no example wav")


@pytest.fixture(scope="module")
def waveform():
    from voiceactivityprojection_tpu.ops.audio import load_waveform

    x, sr = load_waveform(WAV, sample_rate=16_000)
    assert sr == 16_000
    return x[0]


@needs_wav
def test_pitch_flatten_reference_bounds(waveform):
    """reference tests/test_functional.py:19-39."""
    from voiceactivityprojection_tpu.ops.prosody import (
        f0_statistics,
        flatten_pitch,
        pitch_track,
    )

    f0, v = pitch_track(waveform)
    mean, std, voiced_ratio = f0_statistics(f0, v)
    assert voiced_ratio > 0.3
    assert std > 20  # natural speech has substantial F0 variation

    flat = flatten_pitch(waveform, target_f0=mean)
    f0f, vf = pitch_track(flat)
    flat_mean, flat_std, _ = f0_statistics(f0f, vf)

    assert abs(flat_mean - mean) < 2.0, f"flat mean moved {flat_mean - mean:.2f} Hz"
    # the reference's own praat bound (tests/test_functional.py:39),
    # asserted as-is (measured 0.82 Hz on this chain)
    assert flat_std < 2.0, f"flat std {flat_std:.2f} Hz"


@needs_wav
def test_pitch_shift_reference_bounds(waveform):
    """reference tests/test_functional.py:42-63 (factor 0.9)."""
    from voiceactivityprojection_tpu.ops.prosody import (
        f0_statistics,
        pitch_track,
        shift_pitch,
    )

    factor = 0.9
    f0, v = pitch_track(waveform)
    mean, std, _ = f0_statistics(f0, v)

    shifted = shift_pitch(waveform, factor)
    assert shifted.shape == waveform.shape  # duration preserved
    f0s, vs = pitch_track(shifted)
    s_mean, s_std, _ = f0_statistics(f0s, vs)

    assert abs(s_mean - factor * mean) < 2.0, (
        f"shift mean {s_mean:.1f} vs target {factor * mean:.1f}"
    )
    assert abs(s_std - std) < 5.0, f"shift std {s_std:.1f} vs orig {std:.1f}"


@needs_wav
def test_intensity_flatten_reference_bound(waveform):
    """reference tests/test_functional.py:66-75: std strictly lower."""
    from voiceactivityprojection_tpu.ops.prosody import flatten_intensity

    flat = flatten_intensity(waveform)
    assert flat.std() < waveform.std()


@needs_wav
def test_pure_tone_tracking_exact():
    """Tracker ground truth: pure tones across the band track to <3 Hz
    and a 330 Hz tone is NOT halved to its subharmonic (regression for
    the taper-correction saturation bug)."""
    from voiceactivityprojection_tpu.ops.prosody import pitch_track

    sr = 16_000
    t = np.arange(sr) / sr
    for f in (100.0, 150.0, 220.0, 330.0):
        x = (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        f0, v = pitch_track(x)
        assert v.mean() > 0.8
        assert abs(float(f0[v].mean()) - f) < 3.0, (f, float(f0[v].mean()))
