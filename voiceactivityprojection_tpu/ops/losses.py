"""Multitask losses: 256-way CE over projection labels + per-speaker VAD BCE.

Matches the reference semantics (vap/objective.py:220-247): logits are trimmed
to the label length along time before the loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def loss_vap(
    logits: jax.Array, labels: jax.Array, reduction: str = "mean"
) -> jax.Array:
    """Cross-entropy over flattened frames.

    logits: (B, T, n_classes); labels: (B, N) with N <= T (logits trimmed to N,
    vap/objective.py:230-232).
    """
    assert logits.ndim == 3 and labels.ndim == 2
    n = labels.shape[1]
    logits = logits[:, :n]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    nll = nll[..., 0]  # (B, N)
    if reduction == "mean":
        return nll.mean()
    if reduction == "sum":
        return nll.sum()
    if reduction == "none":
        return nll
    raise ValueError(f"unknown reduction {reduction!r}")


def loss_vad(vad_logits: jax.Array, vad: jax.Array) -> jax.Array:
    """BCE-with-logits; vad trimmed to the logits' time length
    (vap/objective.py:245-247 trims vad[:, :n])."""
    n = vad_logits.shape[-2]
    vad = vad[:, :n]
    # numerically-stable binary cross entropy with logits
    z, y = vad_logits, vad
    per = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return per.mean()
