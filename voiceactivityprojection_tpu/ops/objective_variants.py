"""Alternative VAP objective representations: independent & comparative.

The reference snapshot trains only the 256-way discrete codebook head, but
its lineage (Interspeech 2022, arXiv:2205.09812) compares three label
representations, and the reference's own older tests still target them
(tests/test_model_components.py:12-90 — 'discrete'/'independent'/
'comparative' VAPHead variants). This module provides the other two:

* independent: predict each of the 2x4 projection-window bins with an
  independent Bernoulli (head dim 8, BCE). Next-speaker probabilities
  aggregate bin probabilities weighted by bin width.
* comparative: predict a single scalar — the share of speaker A's
  activity in the projection window (head dim 1, BCE with soft targets).
  p_now/p_future are (p, 1-p).

All functions are pure and shape-static; heads plug into the same model
assembly via VapConfig.representation.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.codebook import extract_projection_bins

HEAD_DIMS = {"discrete": 256, "independent": 8, "comparative": 1}


# --------------------------------------------------------------------------
# independent
# --------------------------------------------------------------------------
def get_labels_independent(
    va: jax.Array, bin_frames: Sequence[int], threshold_ratio: float = 0.5
) -> jax.Array:
    """(B, N, 2) -> (B, N - horizon, 2, n_bins) binary bin labels."""
    return extract_projection_bins(va, bin_frames, threshold_ratio)


def loss_vap_independent(
    logits: jax.Array, labels: jax.Array, reduction: str = "mean"
) -> jax.Array:
    """logits (B, T, 8) vs labels (B, N, 2, n_bins); trimmed to N like the
    discrete CE."""
    B, N = labels.shape[:2]
    flat = labels.reshape(B, N, -1)
    z = logits[:, :N]
    per = jnp.maximum(z, 0.0) - z * flat + jnp.log1p(jnp.exp(-jnp.abs(z)))
    if reduction == "mean":
        return per.mean()
    if reduction == "none":
        return per.mean(-1)
    raise ValueError(reduction)


def probs_independent(
    logits: jax.Array,
    bin_frames: Sequence[int],
    from_bin: int = 0,
    to_bin: int = 3,
) -> jax.Array:
    """(B, T, 8) -> (B, T, 2) next-speaker probs: per-speaker bin
    probabilities weighted by bin width, renormalized across speakers."""
    n_bins = len(tuple(bin_frames))
    p = jax.nn.sigmoid(logits).reshape(*logits.shape[:-1], 2, n_bins)
    w = jnp.asarray(bin_frames, dtype=p.dtype)[from_bin : to_bin + 1]
    act = (p[..., from_bin : to_bin + 1] * w).sum(-1)  # (B, T, 2)
    return act / (act.sum(-1, keepdims=True) + 1e-5)


def get_probs_independent(logits: jax.Array, bin_frames: Sequence[int]) -> Dict[str, jax.Array]:
    return {
        "p_now": probs_independent(logits, bin_frames, 0, 1),
        "p_future": probs_independent(logits, bin_frames, 2, 3),
        "p_tot": probs_independent(logits, bin_frames, 0, 3),
    }


# --------------------------------------------------------------------------
# comparative
# --------------------------------------------------------------------------
def get_labels_comparative(
    va: jax.Array, bin_frames: Sequence[int]
) -> jax.Array:
    """(B, N, 2) -> (B, N - horizon) soft label: speaker A's share of total
    activity inside the projection window (0.5 when both silent)."""
    horizon = sum(int(b) for b in bin_frames)
    B, N, C = va.shape
    n_labels = N - horizon
    cs = jnp.cumsum(va, axis=1)
    cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
    tot = cs[:, 1 + horizon : 1 + horizon + n_labels] - cs[:, 1 : 1 + n_labels]
    a, b = tot[..., 0], tot[..., 1]
    return jnp.where(a + b > 0, a / (a + b + 1e-9), 0.5)


def loss_vap_comparative(
    logits: jax.Array, labels: jax.Array, reduction: str = "mean"
) -> jax.Array:
    """logits (B, T, 1) vs soft labels (B, N)."""
    N = labels.shape[1]
    z = logits[:, :N, 0]
    per = jnp.maximum(z, 0.0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))
    if reduction == "mean":
        return per.mean()
    if reduction == "none":
        return per
    raise ValueError(reduction)


def get_probs_comparative(logits: jax.Array) -> Dict[str, jax.Array]:
    p_a = jax.nn.sigmoid(logits[..., 0])
    p = jnp.stack([p_a, 1.0 - p_a], axis=-1)
    return {"p_now": p, "p_future": p, "p_tot": p}
