"""Zero-shot subset tests: subset construction invariants + dispatch logic."""

import numpy as np
import pytest

from voiceactivityprojection_tpu.events.zero_shot import (
    ZeroShot,
    all_permutations_mono,
    combine_speakers,
    end_of_segment_mono,
    on_activity_change_mono,
)
from voiceactivityprojection_tpu.ops.codebook import codebook_matrix

pytestmark = pytest.mark.events


def test_end_of_segment_mono():
    v = end_of_segment_mono(4, 3)
    assert v.shape == (4, 4)
    np.testing.assert_array_equal(v[0], [0, 0, 0, 0])
    np.testing.assert_array_equal(v[1], [1, 0, 0, 0])
    np.testing.assert_array_equal(v[3], [1, 1, 1, 0])


def test_all_permutations():
    v = all_permutations_mono(3)
    assert v.shape == (8, 3)
    np.testing.assert_array_equal(v[0], [0, 0, 0])
    np.testing.assert_array_equal(v[5], [1, 0, 1])  # bin(5) = 101 MSB-first
    v1 = all_permutations_mono(3, start=1)
    assert v1.shape == (7, 3)


def test_on_activity_change():
    v = on_activity_change_mono(4, min_active=2)
    assert v.shape == (4, 4)
    assert (v[:, -2:] == 1).all()  # last two bins always active


def test_combine_speakers_mirror():
    a = np.ones((2, 4), dtype=np.float32)
    b = np.zeros((1, 4), dtype=np.float32)
    v = combine_speakers(a, b, mirror=True)
    assert v.shape == (2, 2, 2, 4)
    # mirrored copy swaps channels
    np.testing.assert_array_equal(v[1], v[0][:, ::-1])
    np.testing.assert_array_equal(v[0][:, 0], a)
    np.testing.assert_array_equal(v[1][:, 1], a)


def test_subsets_are_disjoint_and_valid():
    zs = ZeroShot()
    states = codebook_matrix()  # (256, 2, 4)
    # silence-shift subset for speaker 0: channel 0 active at end, ch 1 silent
    for idx in zs.subset_silence[0]:
        s = states[idx]
        assert s[0, -2:].all() and s[1].sum() == 0
    for idx in zs.subset_silence[1]:
        s = states[idx]
        assert s[1, -2:].all() and s[0].sum() == 0
    # no overlap between shift and its mirrored hold subset
    assert not set(zs.subset_silence[0]) & set(zs.subset_silence_hold[0])
    # backchannel subsets: bc speaker silent in last bin, other active in last
    for idx in zs.bc_prediction[0]:
        s = states[idx]
        assert s[0, -1] == 0 and s[0, :3].sum() >= 1 and s[1, -1] == 1


def test_probs_next_speaker_dispatch():
    zs = ZeroShot()
    B, T = 1, 4
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, T, 256)).astype(np.float32)
    # frame dialog states: silence, A, B, both
    va = np.zeros((B, T, 2), dtype=np.float32)
    va[0, 1, 0] = 1
    va[0, 2, 1] = 1
    va[0, 3] = 1
    out = zs.get_probs(logits, va)
    p = out["p"]
    assert p.shape == (B, T, 2)
    assert np.all(p >= 0) and np.all(p <= 1)
    # overlap frame renormalizes to 1
    np.testing.assert_allclose(p[0, 3].sum(), 1.0, atol=1e-5)
    # single-speaker frames: p_a + p_b = 1 by construction
    np.testing.assert_allclose(p[0, 1].sum(), 1.0, atol=1e-5)
    np.testing.assert_allclose(p[0, 2].sum(), 1.0, atol=1e-5)
    assert out["p_bc"].shape == (B, T, 2)
