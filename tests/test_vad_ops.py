"""VAD algebra tests: RLE, dialog states, vectorized morphology vs loop oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.vad import (
    find_island_idx_len,
    get_dialog_states,
    vad_fill_silences,
    vad_omit_spikes,
    vad_list_to_onehot,
    vad_onehot_to_vad_list,
    get_vad_list_subset,
    add_zero_channel,
)

pytestmark = pytest.mark.events


def test_find_island_idx_len():
    x = np.array([0, 0, 1, 1, 1, 0, 2, 2])
    idx, dur, val = find_island_idx_len(x)
    np.testing.assert_array_equal(idx, [0, 2, 5, 6])
    np.testing.assert_array_equal(dur, [2, 3, 1, 2])
    np.testing.assert_array_equal(val, [0, 1, 0, 2])


def test_find_island_single_value():
    x = np.ones(5)
    idx, dur, val = find_island_idx_len(x)
    np.testing.assert_array_equal(idx, [0])
    np.testing.assert_array_equal(dur, [5])
    np.testing.assert_array_equal(val, [1.0])


def test_dialog_states():
    vad = jnp.asarray(
        [[[1, 0], [0, 0], [1, 1], [0, 1]]], dtype=jnp.float32
    )  # A, silence, both, B
    ds = np.asarray(get_dialog_states(vad))
    np.testing.assert_array_equal(ds[0], [0, 1, 2, 3])


def _oracle_morph(vad, max_len, fill_zeros):
    """Loop-based morphology with reference semantics (fills short islands)."""
    out = vad.copy()
    target = 0 if fill_zeros else 1
    for ch in range(vad.shape[1]):
        idx, dur, val = find_island_idx_len(vad[:, ch])
        for s, d, v in zip(idx, dur, val):
            if v == target and d <= max_len:
                out[s : s + d, ch] = 1 - target
    return out


@pytest.mark.parametrize("max_time", [0.02, 0.1, 0.3])
def test_fill_silences_matches_oracle(max_time):
    rng = np.random.default_rng(0)
    vad = (rng.random((200, 2)) < 0.6).astype(np.float32)
    got = np.asarray(vad_fill_silences(jnp.asarray(vad), max_time, frame_hz=50))
    want = _oracle_morph(vad, round(max_time * 50), fill_zeros=True)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("max_time", [0.02, 0.1, 0.3])
def test_omit_spikes_matches_oracle(max_time):
    rng = np.random.default_rng(1)
    vad = (rng.random((200, 2)) < 0.4).astype(np.float32)
    got = np.asarray(vad_omit_spikes(jnp.asarray(vad), max_time, frame_hz=50))
    want = _oracle_morph(vad, round(max_time * 50), fill_zeros=False)
    np.testing.assert_array_equal(got, want)


def test_morphology_batched():
    rng = np.random.default_rng(2)
    vad = (rng.random((4, 100, 2)) < 0.5).astype(np.float32)
    got = np.asarray(vad_fill_silences(jnp.asarray(vad), 0.1, 50))
    for b in range(4):
        want = _oracle_morph(vad[b], round(0.1 * 50), fill_zeros=True)
        np.testing.assert_array_equal(got[b], want)


def test_vad_list_roundtrip():
    vl = [[[0.0, 1.0], [2.0, 3.0]], [[1.2, 1.8]]]
    onehot = vad_list_to_onehot(vl, duration=4.0, frame_hz=50)
    assert onehot.shape == (200, 2)
    assert onehot[:50, 0].all() and not onehot[50:100, 0].any()
    back = vad_onehot_to_vad_list(onehot[None], frame_hz=50)[0]
    assert back[0] == [[0.0, 1.0], [2.0, 3.0]]
    assert back[1] == [[1.2, 1.8]]


def test_vad_list_subset():
    vl = [[[0.0, 5.0], [8.0, 9.0]], [[6.0, 7.0]]]
    sub = get_vad_list_subset(vl, 4.0, 8.5)
    assert sub[0] == [[0.0, 1.0], [4.0, 4.5]]
    assert sub[1] == [[2.0, 3.0]]


def test_add_zero_channel():
    w = np.ones((3, 1, 100), dtype=np.float32)
    out = add_zero_channel(w)
    assert out.shape == (3, 2, 100)
    assert out[:, 1].sum() == 0


def test_get_activity_history_matches_naive_loop():
    from voiceactivityprojection_tpu.ops.vad import get_activity_history

    rng = np.random.default_rng(0)
    T, bins = 137, (40, 15, 6)
    vad = (rng.random((T, 2)) < 0.35).astype(np.float32)

    def naive(vad, b):
        k = len(b)
        out = np.zeros((T, k + 1))
        for t in range(T):
            spans = [(0, t - b[0])]
            spans += [(t - b[j - 1] + 1, t - b[j]) for j in range(1, k)]
            spans += [(t - b[-1] + 1, t)]
            for j, (s, e) in enumerate(spans):
                s = max(s, 0)
                if e < s:
                    out[t, j] = 0.5
                    continue
                seg = vad[s : e + 1]
                tot = seg.sum()
                out[t, j] = seg[:, 0].sum() / tot if tot > 0 else 0.5
        return out

    got = get_activity_history(vad, bins)
    assert got.shape == (T, len(bins) + 1)
    np.testing.assert_allclose(got, naive(vad, bins), atol=1e-6)


def test_get_activity_history_flip_complement():
    """Swapping the speakers maps the ratio feature to 1 - h on active
    windows and leaves the 0.5 no-activity default fixed."""
    from voiceactivityprojection_tpu.ops.vad import get_activity_history

    rng = np.random.default_rng(1)
    vad = (rng.random((90, 2)) < 0.3).astype(np.float32)
    bins = (30, 10)
    h = get_activity_history(vad, bins)
    hf = get_activity_history(vad[:, ::-1], bins)
    active = ~np.isclose(h, 0.5) | ~np.isclose(hf, 0.5)
    np.testing.assert_allclose(hf[active], 1.0 - h[active], atol=1e-6)
    assert np.isfinite(h).all() and (h >= 0).all() and (h <= 1).all()
