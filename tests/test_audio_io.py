"""Audio IO: format coverage (int16/int24/float32), slicing, fallbacks.

The scipy/wave fallback paths are exercised explicitly (the native C++
decoder, when built, is already diffed against scipy elsewhere); both
fallbacks must support every format the module docstring advertises
(24-bit PCM is not mmap-able, float wavs use format tag 3 which the wave
module rejects).
"""

import numpy as np
import pytest

from voiceactivityprojection_tpu.ops import audio as audio_mod
from voiceactivityprojection_tpu.ops.audio import get_audio_info, load_waveform

pytestmark = pytest.mark.functional


@pytest.fixture()
def no_native(monkeypatch):
    from voiceactivityprojection_tpu.utils import native

    monkeypatch.setattr(native, "available", lambda: False)


def _write_int16(path, x, sr):
    from scipy.io import wavfile

    wavfile.write(path, sr, (np.clip(x.T, -1, 1) * 32767).astype(np.int16))


def _write_float32(path, x, sr):
    from scipy.io import wavfile

    wavfile.write(path, sr, x.T.astype(np.float32))


def _write_int24(path, x, sr):
    import wave

    pcm = (np.clip(x.T, -1, 1) * (2**23 - 1)).astype(np.int32)
    frames = pcm.shape[0]
    b = pcm.astype("<i4").tobytes()
    data = bytearray()
    for i in range(0, len(b), 4):  # little-endian int32 -> 3 LSBs
        data += b[i : i + 3]
    with wave.open(str(path), "wb") as f:
        f.setnchannels(x.shape[0])
        f.setsampwidth(3)
        f.setframerate(sr)
        f.writeframes(bytes(data))


def test_float32_wav_info_and_load(no_native, tmp_path):
    sr = 16000
    x = (np.random.default_rng(0).normal(size=(2, sr)) * 0.1).astype(np.float32)
    p = tmp_path / "f32.wav"
    _write_float32(p, x, sr)
    info = get_audio_info(str(p))
    assert info["sample_rate"] == sr
    assert info["num_frames"] == sr
    assert info["num_channels"] == 2
    w, got_sr = load_waveform(str(p), sample_rate=sr)
    assert got_sr == sr
    np.testing.assert_allclose(w, x, atol=1e-6)


def test_int24_wav_load(no_native, tmp_path):
    sr = 16000
    x = (np.random.default_rng(1).normal(size=(1, sr // 2)) * 0.1).astype(
        np.float32
    )
    p = tmp_path / "i24.wav"
    _write_int24(p, x, sr)
    info = get_audio_info(str(p))
    assert info["bits_per_sample"] == 24
    w, _ = load_waveform(str(p), sample_rate=sr)
    assert w.shape == x.shape
    np.testing.assert_allclose(w, x, atol=2e-4)  # 24-bit quantization


def test_int16_slice_and_resample(no_native, tmp_path):
    sr = 8000
    t = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t))[None].astype(np.float32)
    p = tmp_path / "i16.wav"
    _write_int16(p, x, sr)
    w, got_sr = load_waveform(
        str(p), sample_rate=16000, start_time=0.5, end_time=1.5
    )
    assert got_sr == 16000
    assert w.shape == (1, 16000)  # 1 s upsampled 2x
