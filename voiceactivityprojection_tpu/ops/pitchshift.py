"""Device-side tempo-preserving pitch shift (phase vocoder + resample).

The reference's training augmentation PitchShift (vap/transforms.py:92-107)
is torchaudio's `pitch_shift`: STFT -> phase-vocoder time-stretch by
rate = 2^(-steps/12) -> iSTFT -> resample back to the original duration
(same length, same tempo, scaled F0). This module implements the same
algorithm in pure JAX so pitch augmentation runs INSIDE the fused train
step on TPU: the host TD-PSOLA path costs ~0.2 s per 20 s channel (~6 s
per B=16 stereo batch) while this is a few fused STFT/elementwise ops,
and — unlike resample-only pitch shift — it keeps the waveform aligned
with its VAD labels.

All shapes are static per (length, n_steps): `n_steps` is a Python int
at trace time; the train step dispatches between the +/-1/+/-2 semitone
variants with lax.switch (train/augment.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

N_FFT = 512
HOP = 128
_RESAMPLE_TAPS = 16  # windowed-sinc interpolation taps (8 each side)


def _phase_vocoder(spec: jax.Array, rate: float, hop: int, n_fft: int) -> jax.Array:
    """Time-stretch a complex STFT (..., F, T) by `rate` (torchaudio
    phase_vocoder contract: output has ceil(T/rate) frames; rate < 1
    stretches longer)."""
    F, T = spec.shape[-2], spec.shape[-1]
    phase_advance = jnp.linspace(0.0, math.pi * hop, F)[:, None]

    time_steps = jnp.arange(0, T, rate)  # static length (rate static)
    alphas = (time_steps % 1.0)[None, :]
    idx0 = time_steps.astype(jnp.int32)

    phase_0 = jnp.angle(spec[..., :1])
    spec_p = jnp.pad(spec, [(0, 0)] * (spec.ndim - 1) + [(0, 2)])
    spec_0 = spec_p[..., idx0]
    spec_1 = spec_p[..., idx0 + 1]

    angle_0 = jnp.angle(spec_0)
    angle_1 = jnp.angle(spec_1)
    norm_0 = jnp.abs(spec_0)
    norm_1 = jnp.abs(spec_1)

    phase = angle_1 - angle_0 - phase_advance
    phase = phase - 2.0 * math.pi * jnp.round(phase / (2.0 * math.pi))
    phase = phase + phase_advance
    # first output frame keeps the original phase; subsequent frames
    # accumulate the (wrapped) instantaneous phase increments
    phase = jnp.concatenate([phase_0, phase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(phase, axis=-1)

    mag = alphas * norm_1 + (1.0 - alphas) * norm_0
    return mag * jnp.exp(1j * phase_acc)


def _sinc_resample_positions(y: jax.Array, positions, taps: int = _RESAMPLE_TAPS):
    """Evaluate y (..., L) at fractional sample `positions` (static length)
    via Hann-windowed sinc interpolation."""
    L = y.shape[-1]
    base = jnp.floor(positions).astype(jnp.int32)
    frac = positions - base
    k = jnp.arange(-(taps // 2 - 1), taps // 2 + 1)  # e.g. -7..8
    idx = jnp.clip(base[:, None] + k[None, :], 0, L - 1)  # (n, taps)
    x = k[None, :] - frac[:, None]  # (n, taps)
    window = 0.5 * (1.0 + jnp.cos(math.pi * x / (taps // 2)))
    window = jnp.where(jnp.abs(x) <= taps // 2, window, 0.0)
    w = jnp.sinc(x) * window
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = y[..., idx]  # (..., n, taps)
    return jnp.sum(gathered * w, axis=-1)


@partial(jax.jit, static_argnames=("n_steps", "sample_rate"))
def pitch_shift_semitones(
    waveform: jax.Array, n_steps: int, sample_rate: int = 16_000
) -> jax.Array:
    """Shift pitch by `n_steps` semitones, preserving duration and tempo
    (torchaudio.functional.pitch_shift algorithm; reference
    vap/transforms.py:92-107 semantics). waveform: (..., n)."""
    if n_steps == 0:
        return waveform
    from jax.scipy.signal import istft, stft

    rate = 2.0 ** (-float(n_steps) / 12.0)
    shape = waveform.shape
    n = shape[-1]
    x = waveform.reshape(-1, n)

    _, _, Z = stft(x, nperseg=N_FFT, noverlap=N_FFT - HOP)
    Zs = _phase_vocoder(Z, rate, HOP, N_FFT)
    _, y = istft(Zs, nperseg=N_FFT, noverlap=N_FFT - HOP)

    # resample the stretched signal back to the original duration:
    # output[i] = y(i / rate) (reading the stretch at the shifted rate)
    positions = jnp.arange(n) / rate
    positions = jnp.minimum(positions, y.shape[-1] - 1.0)
    out = _sinc_resample_positions(y, positions)
    return out.reshape(shape).astype(waveform.dtype)
