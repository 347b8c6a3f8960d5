"""GRU as a time-batched matmul + `lax.scan` recurrence.

The reference runs cuDNN `nn.GRU(256, 256, batch_first=True)`
(encoder_components.py:107-159). On TPU the efficient decomposition is:

* ONE large MXU matmul projects the whole input sequence:
  (B*T, C) @ (C, 3H) — this is where the FLOPs are;
* `lax.scan` carries only the O(H^2) recurrent part per step.

Gate order follows torch's (r, z, n) layout so checkpoints import without
re-permutation:  r = σ(xr + hr); z = σ(xz + hz); n = tanh(xn + r*hn);
h' = (1-z)·n + z·h.

A streaming variant (`gru_step`) exposes the carry for the real-time SDS
path (SURVEY.md §7.10).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def init_gru(key: jax.Array, in_dim: int, hidden: int) -> Params:
    """torch default init: U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)

    def u(k, shape):
        return jax.random.uniform(k, shape, minval=-bound, maxval=bound)

    return {
        "w_ih": u(ks[0], (in_dim, 3 * hidden)),  # torch (3H, in) transposed
        "w_hh": u(ks[1], (hidden, 3 * hidden)),
        "b_ih": u(ks[2], (3 * hidden,)),
        "b_hh": u(ks[3], (3 * hidden,)),
    }


def _gru_gates(
    x_proj: jax.Array, h: jax.Array, w_hh: jax.Array, b_hh: jax.Array, hidden: int
) -> jax.Array:
    """One recurrence step given the precomputed input projection (B, 3H)."""
    h_proj = h @ w_hh + b_hh
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru(
    params: Params, x: jax.Array, h0: jax.Array | None = None, impl: str = "auto"
) -> Tuple[jax.Array, jax.Array]:
    """x: (B, T, C) -> (outputs (B, T, H), final carry (B, H)).

    impl: "auto" uses the Pallas recurrence kernel on TPU (weights resident
    in VMEM across steps), "scan" forces lax.scan, "pallas" forces the kernel.
    """
    B, T, _ = x.shape
    hidden = params["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, hidden), dtype=x.dtype)

    # hot matmul: whole-sequence input projection on the MXU
    x_proj = x @ params["w_ih"] + params["b_ih"]  # (B, T, 3H)

    if impl in ("pallas", "auto"):
        from voiceactivityprojection_tpu.ops.gru_pallas import (
            gru_recurrence_pallas,
            pallas_gru_supported,
        )

        if impl == "pallas" or (
            jax.default_backend() not in ("cpu",) and pallas_gru_supported(hidden)
        ):
            return gru_recurrence_pallas(
                x_proj, params["w_hh"], params["b_hh"], h0
            )

    def step(h, xp_t):
        h = _gru_gates(xp_t, h, params["w_hh"], params["b_hh"], hidden)
        return h, h

    h_last, ys = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last


def gru_step(params: Params, x_t: jax.Array, h: jax.Array) -> jax.Array:
    """Single streaming step: x_t (B, C), h (B, H) -> h' (B, H)."""
    hidden = params["w_hh"].shape[0]
    x_proj = x_t @ params["w_ih"] + params["b_ih"]
    return _gru_gates(x_proj, h, params["w_hh"], params["b_hh"], hidden)
