"""Batch callbacks + waveform augmentations.

Mirrors the reference's training-time batch mutations:
* `SymmetricSpeakers` — flip stereo channels + VAD channels with p=0.5
  (vap/callbacks.py:33-79); the model should be speaker-symmetric.
* `Augmentation` — randomly apply one of {gaussian noise, frequency
  masking, pitch shift} (vap/transforms.py:11-138). Pitch shift has two
  modes: `pitch_mode="resample"` (fast polyphase resample-and-crop; shifts
  pitch AND tempo) and `pitch_mode="psola"` (TD-PSOLA from ops/prosody.py;
  tempo-preserving like the reference's torchaudio PitchShift, ~0.26 s per
  20 s channel on host).

All transforms are pure functions over (batch, key); device-side where it
matters (noise, freq-mask via jit), host-side NumPy for resample.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


def flip_channels(
    batch: Dict[str, jax.Array], key: jax.Array, prob: float = 0.5
) -> Dict[str, jax.Array]:
    """Per-sample random stereo+VAD channel flip (vap/callbacks.py:44-66)."""
    B = batch["waveform"].shape[0]
    flip = jax.random.bernoulli(key, prob, (B,))
    wf = jnp.where(flip[:, None, None], batch["waveform"][:, ::-1], batch["waveform"])
    vad = jnp.where(flip[:, None, None], batch["vad"][:, :, ::-1], batch["vad"])
    out = dict(batch)
    out["waveform"] = wf
    out["vad"] = vad
    return out


def mask_vad_channels(
    batch: Dict[str, jax.Array],
    key: jax.Array,
    prob: float = 0.4,
    sample_rate: int = 16_000,
    frame_hz: int = 50,
    scale: float = 0.0,
) -> Dict[str, jax.Array]:
    """With probability `prob` per sample, silence each channel's waveform
    wherever that channel's VAD is inactive (cross-talk / bleed removal,
    the external DataModule's mask_vad option referenced at
    vap/train.py:83-84 and vap/events.py:851-855)."""
    wf = batch["waveform"]  # (B, 2, n)
    vad = batch["vad"]      # (B, T+H, 2)
    B, C, n = wf.shape
    hop = sample_rate // frame_hz
    n_frames = n // hop
    # per-sample activation of the mask
    apply = jax.random.bernoulli(key, prob, (B,))
    active = vad[:, :n_frames].transpose(0, 2, 1)  # (B, 2, n_frames)
    active_samples = jnp.repeat(active, hop, axis=-1)  # (B, 2, n_frames*hop)
    pad = n - active_samples.shape[-1]
    if pad > 0:
        active_samples = jnp.pad(
            active_samples, [(0, 0), (0, 0), (0, pad)], constant_values=1.0
        )
    masked = jnp.where(active_samples > 0, wf, scale * wf)
    out = dict(batch)
    out["waveform"] = jnp.where(apply[:, None, None], masked, wf)
    return out


@partial(jax.jit, static_argnames=("amplitude",))
def add_gaussian_noise(
    waveform: jax.Array, key: jax.Array, amplitude: float = 0.01
) -> jax.Array:
    """(vap/transforms.py:74-90)."""
    return waveform + amplitude * jax.random.normal(key, waveform.shape, waveform.dtype)


@partial(jax.jit, static_argnames=("n_fft", "hop", "max_mask_bins"))
def frequency_mask(
    waveform: jax.Array,
    key: jax.Array,
    n_fft: int = 400,
    hop: int = 200,
    max_mask_bins: int = 40,
) -> jax.Array:
    """STFT -> zero a random frequency band -> iSTFT
    (vap/transforms.py:110-138 uses torchaudio FrequencyMasking)."""
    from jax.scipy.signal import istft, stft

    k1, k2 = jax.random.split(key)
    shape = waveform.shape
    x = waveform.reshape(-1, shape[-1])
    f, t, Z = stft(x, nperseg=n_fft, noverlap=n_fft - hop)
    n_bins = Z.shape[-2]
    width = jax.random.randint(k1, (), 0, max_mask_bins + 1)
    start = jax.random.randint(k2, (), 0, jnp.maximum(n_bins - width, 1))
    bins = jnp.arange(n_bins)
    mask = (bins >= start) & (bins < start + width)
    Z = jnp.where(mask[None, :, None], 0.0, Z)
    _, y = istft(Z, nperseg=n_fft, noverlap=n_fft - hop)
    y = y[..., : shape[-1]]
    pad = shape[-1] - y.shape[-1]
    if pad > 0:
        y = jnp.pad(y, [(0, 0), (0, pad)])
    return y.reshape(shape).astype(waveform.dtype)


def naive_pitch_shift(
    waveform: np.ndarray, n_semitones: float
) -> np.ndarray:
    """Resample-and-crop pitch shift (host-side). Shifts formants and tempo
    together — an augmentation approximation of torchaudio PitchShift."""
    from voiceactivityprojection_tpu.ops.audio import resample

    factor = 2.0 ** (n_semitones / 12.0)
    sr = 16_000
    new_sr = int(round(sr * factor))
    y = resample(np.asarray(waveform), new_sr, sr)
    n = waveform.shape[-1]
    if y.shape[-1] < n:
        y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, n - y.shape[-1])])
    return y[..., :n]


def psola_pitch_shift(waveform: np.ndarray, n_semitones: float) -> np.ndarray:
    """Tempo-preserving pitch shift via TD-PSOLA (ops/prosody.py), matching
    the semantics of the reference's torchaudio PitchShift
    (vap/transforms.py:93-107): F0 scales by 2^(semitones/12), duration and
    temporal alignment (VAD frames) are unchanged. ~0.26 s/channel of 20 s
    audio on host, so this is the opt-in `pitch_mode="psola"` path."""
    from voiceactivityprojection_tpu.ops.prosody import shift_pitch

    factor = 2.0 ** (n_semitones / 12.0)
    wf = np.asarray(waveform, dtype=np.float32)
    flat = wf.reshape(-1, wf.shape[-1])
    out = np.stack([shift_pitch(ch, factor) for ch in flat])
    return out.reshape(wf.shape)


class Augmentation:
    """Random waveform augmentation (vap/transforms.py:11-71): with
    `probability`, apply pitch shift / noise / frequency masking / all
    three, 25% each — mirroring the reference's branch weights.
    """

    def __init__(
        self,
        noise_amplitude: float = 0.01,
        max_pitch_semitones: int = 2,
        probability: float = 0.5,
        seed: int = 0,
        pitch_mode: str = "vocoder",
    ):
        if pitch_mode not in ("vocoder", "resample", "psola"):
            raise ValueError(
                "pitch_mode must be 'vocoder', 'resample' or 'psola', "
                f"got {pitch_mode!r}"
            )
        self.noise_amplitude = noise_amplitude
        self.max_pitch = max_pitch_semitones
        self.probability = probability
        self.pitch_mode = pitch_mode
        # device pitch-branch indices for lax.switch: 0 = off, then the
        # semitone steps the reference samples from (vap/transforms.py:17)
        self.pitch_steps = (
            (0,)
            + tuple(range(1, max_pitch_semitones + 1))
            + tuple(range(-1, -max_pitch_semitones - 1, -1))
        )
        self.np_rng = np.random.default_rng(seed)

    def plan(self) -> tuple:
        """Draw this step's augmentation plan on the HOST rng (identical
        across processes when seeded identically, so multi-host takes the
        same branch): returns (host_semitones | None, device_choice).

        device_choice is a composite index decoded by `augment_on_device`:
        effect = choice % 4 in {0: none, 1: noise, 2: freq-mask,
        3: freq-mask -> noise} and pitch = choice // 4 indexing
        PITCH_STEPS (vocoder mode only — the phase-vocoder shift runs on
        device inside the fused step). In "psola"/"resample" modes the
        pitch branch instead returns host_semitones, applied to numpy
        BEFORE the single host->device put (train/loop.py). Reference
        branch weights preserved (vap/transforms.py:58-70): 25% pitch,
        25% noise, 25% freq-mask, 25% all three (pitch -> mask -> noise).
        """
        if self.np_rng.random() >= self.probability:
            return None, 0
        choice = int(self.np_rng.integers(0, 4))
        semis = None
        pitch_idx = 0
        if choice in (0, 3):
            steps = int(self.np_rng.integers(1, self.max_pitch + 1)) * (
                1 if self.np_rng.random() < 0.5 else -1
            )
            if self.pitch_mode == "vocoder":
                pitch_idx = self.pitch_steps.index(steps)
            else:
                semis = float(steps)
        effect = 0 if choice == 0 else choice
        return semis, effect + 4 * pitch_idx

    def apply_pitch_host(self, waveform: np.ndarray, n_semitones: float) -> np.ndarray:
        """Host-side pitch shift (numpy in/out, no device traffic)."""
        shift = psola_pitch_shift if self.pitch_mode == "psola" else naive_pitch_shift
        return np.asarray(shift(np.asarray(waveform), n_semitones), dtype=np.float32)

    def __call__(self, batch: Dict, key: jax.Array) -> Dict:
        semis, choice = self.plan()
        pitch_idx, effect = choice // 4, choice % 4
        out = dict(batch)
        w = jnp.asarray(batch["waveform"])
        if semis is not None:
            w = jnp.asarray(self.apply_pitch_host(np.asarray(w), semis))
        elif pitch_idx:
            from voiceactivityprojection_tpu.ops.pitchshift import (
                pitch_shift_semitones,
            )

            w = pitch_shift_semitones(w, self.pitch_steps[pitch_idx])
        if effect == 1:
            w = add_gaussian_noise(w, key, self.noise_amplitude)
        elif effect == 2:
            w = frequency_mask(w, key)
        elif effect == 3:
            k1, k2 = jax.random.split(key)
            w = frequency_mask(w, k1)
            w = add_gaussian_noise(w, k2, self.noise_amplitude)
        out["waveform"] = w
        return out


@partial(
    jax.jit,
    static_argnames=(
        "do_flip", "flip_prob", "do_mask", "mask_prob",
        "noise_amplitude", "sample_rate", "frame_hz", "pitch_steps",
    ),
)
def augment_on_device(
    batch: Dict[str, jax.Array],
    key: jax.Array,
    choice: jax.Array,
    *,
    do_flip: bool,
    flip_prob: float,
    do_mask: bool,
    mask_prob: float,
    noise_amplitude: float,
    sample_rate: int,
    frame_hz: int,
    pitch_steps: tuple = (),
) -> Dict[str, jax.Array]:
    """All device-side batch mutations in ONE jitted dispatch, applied to
    the already-sharded batch: channel flip (vap/callbacks.py:44-66), VAD
    masking, then the composite augmentation `choice`:
    ``effect = choice % 4`` in {0 none, 1 noise, 2 freq-mask, 3 freq-mask
    -> noise} and ``pitch = choice // 4`` indexing `pitch_steps` (0 = no
    shift; phase-vocoder pitch shift ops/pitchshift.py — the reference's
    torchaudio-PitchShift semantics, run on device). With pitch_steps=()
    the pitch switch is not traced at all (host pitch modes / tests).
    The train loop never fetches the batch back from the device (the
    previous flow's device->host->numpy->device round-trip cost a full
    batch transfer per step — ~40 MB at B=16 — on the TPU tunnel)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if do_flip:
        batch = flip_channels(batch, k1, flip_prob)
    if do_mask:
        batch = mask_vad_channels(
            batch, k2, mask_prob, sample_rate=sample_rate, frame_hz=frame_hz
        )
    wf = batch["waveform"]
    choice = jnp.asarray(choice, jnp.int32)

    if len(pitch_steps) > 1:
        from voiceactivityprojection_tpu.ops.pitchshift import (
            pitch_shift_semitones,
        )

        def mk_pitch(steps):
            if steps == 0:
                return lambda w: w
            return lambda w: pitch_shift_semitones(w, steps, sample_rate)

        wf = jax.lax.switch(
            choice // 4, [mk_pitch(s) for s in pitch_steps], wf
        )

    def none_fn(w):
        return w

    def noise_fn(w):
        return add_gaussian_noise(w, k3, noise_amplitude)

    def fmask_fn(w):
        return frequency_mask(w, k4)

    def both_fn(w):
        return add_gaussian_noise(frequency_mask(w, k4), k3, noise_amplitude)

    wf = jax.lax.switch(
        choice % 4, [none_fn, noise_fn, fmask_fn, both_fn], wf
    )
    out = dict(batch)
    out["waveform"] = wf
    return out
