"""Augmentation tests: channel flip, noise, freq-mask, vad-mask, wrappers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.train.augment import (
    Augmentation,
    add_gaussian_noise,
    flip_channels,
    frequency_mask,
    mask_vad_channels,
    naive_pitch_shift,
)

pytestmark = pytest.mark.train


def batch(B=4, n=8000, frames=125):
    rng = np.random.default_rng(0)
    return {
        "waveform": jnp.asarray(rng.normal(size=(B, 2, n)).astype(np.float32)),
        "vad": jnp.asarray((rng.random((B, frames, 2)) < 0.5).astype(np.float32)),
    }


def test_flip_channels_swaps_consistently():
    b = batch()
    out = flip_channels(b, jax.random.key(0), prob=1.0)
    np.testing.assert_array_equal(
        np.asarray(out["waveform"]), np.asarray(b["waveform"][:, ::-1])
    )
    np.testing.assert_array_equal(
        np.asarray(out["vad"]), np.asarray(b["vad"][:, :, ::-1])
    )
    out0 = flip_channels(b, jax.random.key(0), prob=0.0)
    np.testing.assert_array_equal(np.asarray(out0["waveform"]), np.asarray(b["waveform"]))


def test_gaussian_noise_changes_waveform():
    b = batch()
    out = add_gaussian_noise(b["waveform"], jax.random.key(1), 0.01)
    d = np.abs(np.asarray(out) - np.asarray(b["waveform"]))
    assert 0 < d.mean() < 0.05


def test_frequency_mask_reduces_band_energy():
    t = np.arange(16000) / 16000
    x = jnp.asarray(np.sin(2 * np.pi * 1000 * t)[None, None].astype(np.float32))
    x = jnp.tile(x, (1, 2, 1))
    masked = frequency_mask(x, jax.random.key(3), max_mask_bins=201)
    assert masked.shape == x.shape
    # energy can only be removed, not added (modulo edge effects)
    assert float(jnp.abs(masked).sum()) <= float(jnp.abs(x).sum()) * 1.05


def test_mask_vad_channels():
    b = batch(B=2, n=8000, frames=125)
    vad = np.zeros((2, 125, 2), dtype=np.float32)
    vad[:, :10, 0] = 1.0  # ch0 active only first 10 frames
    b["vad"] = jnp.asarray(vad)
    out = mask_vad_channels(b, jax.random.key(0), prob=1.0)
    w = np.asarray(out["waveform"])
    hop = 320
    # ch0 active region untouched, inactive region zeroed (25 frames fit 8000)
    np.testing.assert_array_equal(w[:, 0, : 10 * hop], np.asarray(b["waveform"])[:, 0, : 10 * hop])
    assert np.abs(w[:, 0, 10 * hop : 25 * hop]).sum() == 0
    # ch1 never active -> fully silenced in covered frames
    assert np.abs(w[:, 1, : 25 * hop]).sum() == 0


def test_naive_pitch_shift_shapes():
    x = np.random.default_rng(0).normal(size=(2, 2, 4000)).astype(np.float32)
    y = naive_pitch_shift(x, 2.0)
    assert y.shape == x.shape


def test_augmentation_applies_or_not():
    aug = Augmentation(probability=1.0, seed=0)
    b = batch()
    out = aug(b, jax.random.key(0))
    assert not np.allclose(np.asarray(out["waveform"]), np.asarray(b["waveform"]))
    aug_off = Augmentation(probability=0.0, seed=0)
    out2 = aug_off(b, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out2["waveform"]), np.asarray(b["waveform"]))


def test_prosody_batch_wrappers():
    from voiceactivityprojection_tpu.ops.prosody import FlatIntensity, LowPass

    x = np.random.default_rng(0).normal(size=(1, 2, 8000)).astype(np.float32)
    for T in (FlatIntensity(), LowPass(cutoff_freq=400)):
        y = T(x)
        assert y.shape == x.shape


def test_psola_pitch_shift_preserves_tempo_and_shifts_f0():
    from voiceactivityprojection_tpu.ops.prosody import pitch_track
    from voiceactivityprojection_tpu.train.augment import psola_pitch_shift

    sr = 16_000
    t = np.arange(3 * sr) / sr
    # amplitude-modulated 150 Hz tone: AM envelope marks "tempo"
    env = 1.0 + 0.5 * np.sin(2 * np.pi * 2.0 * t)
    x = (0.3 * np.sin(2 * np.pi * 150.0 * t) * env).astype(np.float32)[None, None]

    semis = 3.0
    y = psola_pitch_shift(x, semis)
    assert y.shape == x.shape  # duration unchanged (torchaudio PitchShift semantics)

    f0_x, vx = pitch_track(x[0, 0], sr)
    f0_y, vy = pitch_track(y[0, 0], sr)
    both = vx & vy
    assert both.mean() > 0.5
    ratio = np.median(f0_y[both] / f0_x[both])
    assert abs(ratio - 2.0 ** (semis / 12.0)) < 0.03

    # tempo preserved: AM envelope (frame RMS) stays time-aligned
    from voiceactivityprojection_tpu.ops.prosody import frame_rms

    rx = frame_rms(x[0, 0])
    ry = frame_rms(y[0, 0])
    n = min(len(rx), len(ry))
    rx, ry = rx[:n] - rx[:n].mean(), ry[:n] - ry[:n].mean()
    corr = float((rx * ry).sum() / (np.linalg.norm(rx) * np.linalg.norm(ry) + 1e-9))
    assert corr > 0.9


def test_augmentation_psola_mode_dispatch():
    aug = Augmentation(probability=1.0, seed=3, pitch_mode="psola")
    # force the pitch branch by seeding until choice==2 is drawn
    found = False
    for seed in range(20):
        rng = np.random.default_rng(seed)
        if rng.random() < 1.0 and rng.integers(0, 3) == 2:
            aug = Augmentation(probability=1.0, seed=seed, pitch_mode="psola")
            found = True
            break
    assert found
    b = batch()
    out = aug(b, jax.random.key(0))
    assert out["waveform"].shape == b["waveform"].shape
    assert not np.allclose(np.asarray(out["waveform"]), np.asarray(b["waveform"]))


def test_plan_branch_distribution_and_semantics():
    """plan() preserves the reference branch weights (25% each of pitch /
    noise / freq-mask / all-three at probability=1). In the default
    vocoder mode the pitch branch is encoded in the composite choice
    (choice // 4 indexes pitch_steps) with no host semitones; in psola /
    resample modes it returns host semitones instead."""
    aug = Augmentation(probability=1.0, seed=0)  # vocoder default
    counts = {0: 0, 1: 0, 2: 0, 3: 0}
    pitch_branches = 0
    for _ in range(400):
        semis, choice = aug.plan()
        assert semis is None  # vocoder: pitch on device
        pitch_idx, effect = choice // 4, choice % 4
        counts[effect] += 1
        if pitch_idx:
            pitch_branches += 1
            steps = aug.pitch_steps[pitch_idx]
            assert 1 <= abs(steps) <= aug.max_pitch
            assert effect in (0, 3)
    for c in counts.values():
        assert 50 < c < 150, counts
    assert abs(pitch_branches - 200) < 60  # branches 0 and 3 carry pitch

    host = Augmentation(probability=1.0, seed=0, pitch_mode="psola")
    host_pitch = 0
    for _ in range(200):
        semis, choice = host.plan()
        assert choice // 4 == 0  # host modes never use the device branch
        if semis is not None:
            host_pitch += 1
            assert 1 <= abs(semis) <= host.max_pitch
            assert choice % 4 in (0, 3)
    assert host_pitch > 50

    off = Augmentation(probability=0.0, seed=0)
    for _ in range(10):
        semis, choice = off.plan()
        assert semis is None and choice == 0


def test_augment_on_device_matches_component_fns():
    """One-dispatch device augmentation == composing the individual ops
    with the same subkeys (flip -> vad-mask -> switch branch)."""
    from voiceactivityprojection_tpu.train.augment import augment_on_device

    b = batch()
    key = jax.random.key(42)
    kw = dict(
        do_flip=True, flip_prob=0.5, do_mask=True, mask_prob=0.4,
        noise_amplitude=0.01, sample_rate=16_000, frame_hz=50,
    )
    k1, k2, k3, k4 = jax.random.split(key, 4)
    base = flip_channels(b, k1, 0.5)
    base = mask_vad_channels(base, k2, 0.4, sample_rate=16_000, frame_hz=50)

    for choice, expect in (
        (0, base["waveform"]),
        (1, add_gaussian_noise(base["waveform"], k3, 0.01)),
        (2, frequency_mask(base["waveform"], k4)),
        (3, add_gaussian_noise(frequency_mask(base["waveform"], k4), k3, 0.01)),
    ):
        out = augment_on_device(b, key, choice, **kw)
        np.testing.assert_allclose(
            np.asarray(out["waveform"]), np.asarray(expect), atol=1e-6,
            err_msg=f"choice={choice}",
        )
        np.testing.assert_array_equal(
            np.asarray(out["vad"]), np.asarray(base["vad"])
        )


def test_augment_on_device_gates_off():
    from voiceactivityprojection_tpu.train.augment import augment_on_device

    b = batch()
    out = augment_on_device(
        b, jax.random.key(0), 0,
        do_flip=False, flip_prob=0.5, do_mask=False, mask_prob=0.4,
        noise_amplitude=0.01, sample_rate=16_000, frame_hz=50,
    )
    np.testing.assert_array_equal(np.asarray(out["waveform"]), np.asarray(b["waveform"]))
    np.testing.assert_array_equal(np.asarray(out["vad"]), np.asarray(b["vad"]))


def test_device_pitch_shift_semantics():
    """Phase-vocoder pitch shift (ops/pitchshift.py): duration unchanged,
    F0 scaled by 2^(steps/12), tempo (AM envelope) preserved — the
    reference's torchaudio-PitchShift semantics (vap/transforms.py:92-107)."""
    from voiceactivityprojection_tpu.ops.pitchshift import pitch_shift_semitones
    from voiceactivityprojection_tpu.ops.prosody import (
        f0_statistics,
        frame_rms,
        pitch_track,
    )

    sr = 16_000
    t = np.arange(sr) / sr
    env = (1.0 + 0.5 * np.sin(2 * np.pi * 2.0 * t)).astype(np.float32)
    x = (0.3 * np.sin(2 * np.pi * 150.0 * t) * env).astype(np.float32)

    for steps in (1, 2, -2):
        y = np.asarray(pitch_shift_semitones(jnp.asarray(x), steps))
        assert y.shape == x.shape
        f0, v = pitch_track(y)
        mean, _, _ = f0_statistics(f0, v)
        want = 150.0 * 2.0 ** (steps / 12.0)
        assert abs(mean - want) / want < 0.02, (steps, mean, want)
        rx, ry = frame_rms(x), frame_rms(y)
        n = min(len(rx), len(ry))
        rx, ry = rx[:n] - rx[:n].mean(), ry[:n] - ry[:n].mean()
        corr = float((rx * ry).sum() / (np.linalg.norm(rx) * np.linalg.norm(ry) + 1e-9))
        assert corr > 0.95, (steps, corr)


def test_augment_on_device_pitch_branch():
    """Composite choice: pitch branch via lax.switch equals a direct
    pitch_shift_semitones call; pitch_steps=() never traces it."""
    from voiceactivityprojection_tpu.train.augment import augment_on_device
    from voiceactivityprojection_tpu.ops.pitchshift import pitch_shift_semitones

    b = batch()
    key = jax.random.key(7)
    steps = (0, 1, 2, -1, -2)
    kw = dict(
        do_flip=False, flip_prob=0.5, do_mask=False, mask_prob=0.4,
        noise_amplitude=0.01, sample_rate=16_000, frame_hz=50,
        pitch_steps=steps,
    )
    # choice = effect 0 + 4 * pitch_idx 2 (=+2 semitones)
    out = augment_on_device(b, key, 8, **kw)
    want = pitch_shift_semitones(b["waveform"], 2)
    np.testing.assert_allclose(
        np.asarray(out["waveform"]), np.asarray(want), atol=1e-5
    )
    # pitch_idx 0 is the identity
    out0 = augment_on_device(b, key, 0, **kw)
    np.testing.assert_array_equal(np.asarray(out0["waveform"]), np.asarray(b["waveform"]))
