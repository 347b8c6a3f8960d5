"""Objective layer tests: projection windows, codebook, aggregation, losses.

Oracles are brute-force NumPy implementations of the reference semantics
(vap/objective.py): explicit unfold + per-bin threshold, nearest-neighbour
codebook search, explicit einsum aggregation — independently written, then
compared against the fast cumsum/bit-pack implementations.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.codebook import (
    extract_projection_bins,
    codebook_encode,
    codebook_decode,
    codebook_matrix,
    get_labels,
    probs_next_speaker_aggregate,
    get_probs,
    entropy_bits,
)
from voiceactivityprojection_tpu.ops.losses import loss_vap, loss_vad

BIN_FRAMES = [10, 20, 30, 40]
HORIZON = 100

pytestmark = pytest.mark.objective


def oracle_projection_bins(va, bin_frames, thr=0.5):
    """Explicit unfold implementation (reference semantics, numpy)."""
    B, N, C = va.shape
    horizon = sum(bin_frames)
    n_lab = N - horizon
    out = np.zeros((B, n_lab, C, len(bin_frames)), dtype=va.dtype)
    for b in range(B):
        for t in range(n_lab):
            win = va[b, t + 1 : t + 1 + horizon]  # (horizon, C)
            start = 0
            for k, bf in enumerate(bin_frames):
                seg = win[start : start + bf]
                ratio = seg.sum(0) / bf
                out[b, t, :, k] = (ratio >= thr).astype(va.dtype)
                start += bf
    return out


def oracle_encode_nearest(bins):
    """Nearest-neighbour codebook search (reference vap/objective.py:112-139)."""
    codes = codebook_matrix().reshape(256, 8)  # (256, 8) binary, LSB-first
    flat = bins.reshape(-1, 8)
    d = ((flat[:, None, :] - codes[None, :, :]) ** 2).sum(-1)
    return d.argmin(-1).reshape(bins.shape[:-2])


def rand_vad(B=2, N=300, seed=0):
    rng = np.random.default_rng(seed)
    # blocky VAD: random on/off segments
    vad = np.zeros((B, N, 2), dtype=np.float32)
    for b in range(B):
        for c in range(2):
            t = 0
            while t < N:
                dur = rng.integers(5, 60)
                if rng.random() < 0.5:
                    vad[b, t : t + dur, c] = 1.0
                t += dur
    return vad


def test_projection_bins_match_oracle():
    vad = rand_vad(B=3, N=250, seed=1)
    got = np.asarray(extract_projection_bins(jnp.asarray(vad), BIN_FRAMES))
    want = oracle_projection_bins(vad, BIN_FRAMES)
    assert got.shape == (3, 150, 2, 4)
    np.testing.assert_array_equal(got, want)


def test_codebook_encode_equals_nearest_neighbour():
    rng = np.random.default_rng(2)
    bins = rng.integers(0, 2, size=(5, 7, 2, 4)).astype(np.float32)
    got = np.asarray(codebook_encode(jnp.asarray(bins)))
    want = oracle_encode_nearest(bins)
    np.testing.assert_array_equal(got, want)


def test_codebook_roundtrip():
    idx = jnp.arange(256)
    states = codebook_decode(idx)
    assert states.shape == (256, 2, 4)
    back = codebook_encode(states)
    np.testing.assert_array_equal(np.asarray(back), np.arange(256))


def test_codebook_bit_layout():
    # index bit i corresponds to flat position i = channel*4 + bin, LSB first
    # (reference vap/objective.py:93-99 builds codes LSB-first)
    states = np.asarray(codebook_decode(jnp.asarray([1, 2, 16, 128])))
    np.testing.assert_array_equal(states[0], [[1, 0, 0, 0], [0, 0, 0, 0]])
    np.testing.assert_array_equal(states[1], [[0, 1, 0, 0], [0, 0, 0, 0]])
    np.testing.assert_array_equal(states[2], [[0, 0, 0, 0], [1, 0, 0, 0]])
    np.testing.assert_array_equal(states[3], [[0, 0, 0, 0], [0, 0, 0, 1]])


def test_get_labels_shape_and_range():
    vad = rand_vad(B=2, N=1100, seed=3)
    labels = np.asarray(get_labels(jnp.asarray(vad), BIN_FRAMES))
    assert labels.shape == (2, 1000)
    assert labels.min() >= 0 and labels.max() < 256


def test_probs_aggregate_matches_oracle():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(2, 13, 256)).astype(np.float32)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)

    states = codebook_matrix()  # (256, 2, 4)
    for frm, to in [(0, 1), (2, 3), (0, 3)]:
        abp = states[:, :, frm : to + 1].sum(-1)  # (256, 2)
        want = np.einsum("btc,cs->bts", np.asarray(probs), abp)
        want = want / (want.sum(-1, keepdims=True) + 1e-5)
        got = np.asarray(probs_next_speaker_aggregate(probs, frm, to))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_get_probs_keys_and_sums():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(size=(1, 9, 256)).astype(np.float32))
    out = get_probs(logits)
    assert set(out) == {"probs", "p_now", "p_future", "p_tot"}
    # normalized two-way probs sum to ~1
    s = np.asarray(out["p_now"].sum(-1))
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-3)


def test_entropy_bounds():
    uniform = jnp.full((1, 4, 256), 1.0 / 256)
    H = np.asarray(entropy_bits(uniform))
    np.testing.assert_allclose(H, 8.0, atol=1e-5)
    onehot = jax.nn.one_hot(jnp.zeros((1, 4), jnp.int32), 256)
    H0 = np.asarray(entropy_bits(onehot))
    np.testing.assert_allclose(H0, 0.0, atol=1e-6)


def test_loss_vap_matches_manual_ce():
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(2, 12, 256)).astype(np.float32)
    labels = rng.integers(0, 256, size=(2, 10))
    got = float(loss_vap(jnp.asarray(logits), jnp.asarray(labels)))
    # manual CE with trimming
    lt = logits[:, :10]
    lse = np.log(np.exp(lt).sum(-1))
    nll = lse - np.take_along_axis(lt, labels[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(got, nll.mean(), rtol=1e-5)

    per_frame = np.asarray(
        loss_vap(jnp.asarray(logits), jnp.asarray(labels), reduction="none")
    )
    assert per_frame.shape == (2, 10)
    np.testing.assert_allclose(per_frame, nll, rtol=1e-5)


def test_loss_vad_matches_manual_bce():
    rng = np.random.default_rng(7)
    z = rng.normal(size=(2, 12, 2)).astype(np.float32)
    y = (rng.random((2, 15, 2)) < 0.5).astype(np.float32)
    got = float(loss_vad(jnp.asarray(z), jnp.asarray(y)))
    yt = y[:, :12]
    p = 1 / (1 + np.exp(-z))
    bce = -(yt * np.log(p) + (1 - yt) * np.log(1 - p))
    np.testing.assert_allclose(got, bce.mean(), rtol=1e-4)
