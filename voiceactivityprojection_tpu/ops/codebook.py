"""VAP label space: projection windows, binary codebook, next-speaker probs.

Behavioral contract comes from the reference (vap/objective.py:10-281), but the
implementation is TPU-native:

* The reference's ``Codebook`` is an ``nn.Embedding(256, 8)`` holding all 8-bit
  binary codes, with encode = nearest-neighbour distance argmax
  (vap/objective.py:112-139). The codes are literally the binary expansion of
  the index (LSB first, vap/objective.py:93-99), so encode is *exactly* a dot
  product with powers of two — an O(8) integer op instead of a 256-way
  distance search. decode is a bit-test against the index.

* The reference's ``ProjectionWindow`` materializes (B, N, 2, 100) unfolded
  windows (vap/objective.py:40-76). Here per-bin activity sums are computed
  from an exclusive cumulative sum along time: sum(va[t+a : t+b]) =
  cs[t+b] - cs[t+a]. O(T) memory, static shapes, fuses into surrounding ops.

Layout convention (matches reference rearrange "... c bpp -> ... (c bpp)" with
bit i of the index = flat position i, LSB first): index bit (c * n_bins + b)
corresponds to (channel c, bin b).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bin_edges(bin_frames: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    edges = []
    start = 0
    for b in bin_frames:
        edges.append((start, start + b))
        start += b
    return tuple(edges)


def extract_projection_bins(
    va: jax.Array,
    bin_frames: Sequence[int],
    threshold_ratio: float = 0.5,
) -> jax.Array:
    """Per-frame discretized future-activity bins.

    Arguments:
        va: (B, N, 2) binary voice activity (float)
        bin_frames: e.g. [10, 20, 30, 40] at 50 Hz (sums to horizon=100)

    Returns:
        (B, N - horizon, 2, n_bins) float binary bins.

    For label frame t the window is va[t+1 : t+1+horizon] (the reference
    shifts by one frame before unfolding, vap/objective.py:40-53); bin b is
    active when its mean activity >= threshold_ratio (vap/objective.py:55-72).
    """
    bin_frames = tuple(int(b) for b in bin_frames)
    horizon = sum(bin_frames)
    B, N, C = va.shape
    n_labels = N - horizon
    if n_labels <= 0:
        raise ValueError(f"Need more than horizon={horizon} frames, got {N}")

    # exclusive cumsum over time: cs[:, t] = sum(va[:, :t]); shape (B, N+1, C)
    cs = jnp.cumsum(va, axis=1)
    cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)

    outs = []
    for (a, b) in _bin_edges(bin_frames):
        # window for label t covers va[t+1+a : t+1+b]
        hi = cs[:, 1 + b : 1 + b + n_labels]
        lo = cs[:, 1 + a : 1 + a + n_labels]
        ratio = (hi - lo) / float(b - a)
        outs.append((ratio >= threshold_ratio).astype(va.dtype))
    return jnp.stack(outs, axis=-1)  # (B, n_labels, 2, n_bins)


# Backwards-friendly alias matching the reference's two-step naming
projection_windows_to_bins = extract_projection_bins


def codebook_encode(proj_bins: jax.Array, n_bins: int = 4) -> jax.Array:
    """(..., 2, n_bins) binary -> (...,) int32 class index.

    Exact equivalent of the reference's nearest-code argmax
    (vap/objective.py:112-139): since codes are all binary vectors, the closest
    code to a binary input is the input itself, i.e. idx = sum_i bit_i * 2^i
    with flat position i = channel * n_bins + bin (LSB first).
    """
    *lead, c, nb = proj_bins.shape
    assert c == 2 and nb == n_bins, f"expected (..., 2, {n_bins}), got {proj_bins.shape}"
    flat = proj_bins.reshape(*lead, c * nb)
    powers = jnp.asarray(2 ** np.arange(c * nb), dtype=flat.dtype)
    idx = jnp.tensordot(flat, powers, axes=1)
    return idx.astype(jnp.int32)


def codebook_decode(idx: jax.Array, n_bins: int = 4, dtype=jnp.float32) -> jax.Array:
    """(...,) int -> (..., 2, n_bins) binary states (vap/objective.py:141-143)."""
    total = 2 * n_bins
    bits = jnp.right_shift(idx[..., None], jnp.arange(total, dtype=idx.dtype)) & 1
    return bits.reshape(*idx.shape, 2, n_bins).astype(dtype)


def codebook_matrix(n_bins: int = 4, dtype=np.float32) -> np.ndarray:
    """All (n_classes, 2, n_bins) states as a host-side constant."""
    n_classes = 2 ** (2 * n_bins)
    idx = np.arange(n_classes)
    bits = (idx[:, None] >> np.arange(2 * n_bins)) & 1
    return bits.reshape(n_classes, 2, n_bins).astype(dtype)


def get_labels(
    va: jax.Array,
    bin_frames: Sequence[int],
    threshold_ratio: float = 0.5,
) -> jax.Array:
    """(B, N, 2) VAD -> (B, N - horizon) int32 labels (vap/objective.py:209-212)."""
    bins = extract_projection_bins(va, bin_frames, threshold_ratio)
    return codebook_encode(bins, n_bins=len(tuple(bin_frames)))


def get_da_labels(
    va: jax.Array,
    bin_frames: Sequence[int],
    threshold_ratio: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Labels plus per-window dialog-state counts (vap/objective.py:214-218)."""
    bins = extract_projection_bins(va, bin_frames, threshold_ratio)
    idx = codebook_encode(bins, n_bins=len(tuple(bin_frames)))
    ds = (bins.sum(-1) > 0).sum(-1)
    return idx, ds


def _aggregate_weights(
    from_bin: int,
    to_bin: int,
    n_bins: int = 4,
    bin_frames: Sequence[int] | None = None,
    scale_with_bins: bool = False,
    dtype=np.float32,
) -> np.ndarray:
    """(n_classes, 2) per-state speaker-activity weights, host-side constant."""
    states = codebook_matrix(n_bins, dtype)  # (C, 2, n_bins)
    if scale_with_bins:
        assert bin_frames is not None
        states = states * np.asarray(bin_frames, dtype=dtype)
    return states[:, :, from_bin : to_bin + 1].sum(-1)  # (C, 2)


def probs_next_speaker_aggregate(
    probs: jax.Array,
    from_bin: int = 0,
    to_bin: int = 3,
    bin_frames: Sequence[int] | None = None,
    scale_with_bins: bool = False,
    n_bins: int = 4,
) -> jax.Array:
    """Aggregate the 256-way distribution into per-speaker next-speaker probs.

    (B, T, n_classes) -> (B, T, 2); weighted by each state's activity in bins
    [from_bin, to_bin], normalized with the reference's +1e-5 denominator
    (vap/objective.py:184-204).
    """
    assert probs.ndim == 3, f"expected (B, T, n_classes), got {probs.shape}"
    abp = jnp.asarray(
        _aggregate_weights(from_bin, to_bin, n_bins, bin_frames, scale_with_bins)
    ).astype(probs.dtype)
    p_all = jnp.einsum("btc,cs->bts", probs, abp)
    p_all = p_all / (p_all.sum(-1, keepdims=True) + 1e-5)
    return p_all


def entropy_bits(probs: jax.Array, axis: int = -1) -> jax.Array:
    """Shannon entropy in bits; 0 * log2(0) := 0 (vap/model.py:201-202)."""
    logp = jnp.where(probs > 0, jnp.log2(jnp.where(probs > 0, probs, 1.0)), 0.0)
    return -(probs * logp).sum(axis=axis)


def get_probs(logits: jax.Array) -> Dict[str, jax.Array]:
    """Softmax + p_now/p_future/p_tot aggregates (vap/objective.py:249-281)."""
    probs = jax.nn.softmax(logits, axis=-1)
    return {
        "probs": probs,
        "p_now": probs_next_speaker_aggregate(probs, 0, 1),
        "p_future": probs_next_speaker_aggregate(probs, 2, 3),
        "p_tot": probs_next_speaker_aggregate(probs, 0, 3),
    }
