"""KV-cache streaming VAP: O(1) transformer work per new frame.

The reference SDS loop recomputes the ENTIRE model over a rolling 20 s
window per 20 ms hop (sds/run_sds.py:216-241). ``StreamingVap``
(inference/streaming.py) already makes the encoder incremental but still
re-runs the transformer over the whole context window each hop. Here the
transformer is incremental too: every attention site keeps per-layer K/V
ring buffers (newest frame in the last slot), so each new frame costs one
attention ROW per site — (1 x T) scores instead of (T x T) — plus one
frame of LN/FFN/head work.

Semantics
---------
* While fewer than ``context_frames`` frames have been seen, outputs are
  EXACTLY the batch forward over the true prefix (causal attention makes
  earlier rows independent of later ones; tested allclose in
  tests/test_streaming_kv.py). Note this differs from ``StreamingVap``,
  whose zero-initialized feature ring means "20 s of silence context".
* Once the ring is full, each layer attends to its most recent
  ``context_frames`` keys (per-layer sliding window). Unlike window
  recompute — which truncates the INPUT and rebuilds everything from it —
  cached layer-L states carry history of up to L*context_frames frames,
  with ALiBi extrapolating the longer relative distances (the property it
  was designed for, reference modules.py:113-158).

Parity-sensitive details mirrored from ops/attention.py / models/
transformer.py: full-dim 1/sqrt(dim) score scale (modules.py:52),
non-trainable ALiBi slopes "m", pre-LN blocks, cross-attention K/V taken
from the other channel's PRE-layer, deliberately UN-normalized value
(modules.py:266-272), causal mask j <= i (the current frame IS visible to
the other channel's cross-attention), combinator + heads per frame.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.encoder import (
    apply_encoder_streaming,
    init_encoder_state,
)
from voiceactivityprojection_tpu.models.encoder_streaming_exact import (
    ExactStreamingEncoder,
)
from voiceactivityprojection_tpu.models.transformer import apply_combinator
from voiceactivityprojection_tpu.ops.codebook import (
    entropy_bits,
    probs_next_speaker_aggregate,
)

Params = Dict[str, Any]

SAMPLES_PER_FRAME = 320  # 16 kHz / 50 Hz


# --------------------------------------------------------------------------
# state
# --------------------------------------------------------------------------
def _ring(num_heads: int, T: int, head_dim: int) -> jax.Array:
    # leading axis 2 = the two speaker channels
    return jnp.zeros((2, num_heads, T, head_dim), dtype=jnp.float32)


def init_kv_state(conf: VapConfig, context_frames: int) -> Params:
    """Zeroed K/V rings for every attention site + a frame counter."""
    H = conf.num_heads
    Dh = conf.dim // H
    T = context_frames
    return {
        "n": jnp.zeros((), dtype=jnp.int32),
        "ar_channel": [
            {"k": _ring(H, T, Dh), "v": _ring(H, T, Dh)}
            for _ in range(conf.channel_layers)
        ],
        "ar": [
            {
                "k": _ring(H, T, Dh),
                "v": _ring(H, T, Dh),
                # cross rings hold THIS channel's projections of its own
                # pre-layer value; the other channel's query reads them
                "ck": _ring(H, T, Dh),
                "cv": _ring(H, T, Dh),
            }
            for _ in range(conf.cross_layers)
        ],
    }


# --------------------------------------------------------------------------
# single-frame primitives
# --------------------------------------------------------------------------
def _layer_norm_vec(x: jax.Array, p: Params) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return (xf * p["w"] + p["b"]).astype(x.dtype)


def _heads(x: jax.Array, num_heads: int) -> jax.Array:
    # (2, D) -> (2, H, Dh)
    C, D = x.shape
    return x.reshape(C, num_heads, D // num_heads)


def _push_ring(ring: jax.Array, new: jax.Array) -> jax.Array:
    """Shift the time axis left by one and write `new` into the last slot.

    Keeping the newest frame at a FIXED slot makes the ALiBi bias vector a
    compile-time constant (distance T-1-j for slot j)."""
    ring = jnp.roll(ring, -1, axis=2)
    return ring.at[:, :, -1].set(new)


def _attn_row(
    q: jax.Array,      # (2, H, Dh)
    k_ring: jax.Array,  # (2, H, T, Dh)
    v_ring: jax.Array,
    slopes: jax.Array,  # (H,)
    n: jax.Array,       # valid frame count (<= T), newest slot inclusive
    full_dim: int,
) -> jax.Array:
    """One attention row per channel/head over a ring whose newest entry
    sits at slot T-1. Returns (2, H*Dh)."""
    T = k_ring.shape[2]
    scale = 1.0 / math.sqrt(full_dim)  # full-dim quirk (modules.py:52)
    scores = jnp.einsum(
        "chd,chtd->cht", q, k_ring, preferred_element_type=jnp.float32
    ) * scale
    # relative position of slot j vs the current frame: j - i = -(T-1-j)
    rel = jnp.arange(T, dtype=jnp.float32) - (T - 1)
    bias = jax.lax.stop_gradient(slopes).astype(jnp.float32)[:, None] * rel[None, :]
    scores = scores + bias[None]
    valid = jnp.arange(T) >= (T - n)
    scores = jnp.where(valid[None, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(v_ring.dtype)
    out = jnp.einsum("cht,chtd->chd", w, v_ring)
    return out.reshape(out.shape[0], -1)


def _self_attn_step(
    mha: Params, z: jax.Array, rings: Params, n: jax.Array,
    num_heads: int, dim: int,
) -> Tuple[jax.Array, Params]:
    q = _heads(z @ mha["query"]["w"].T, num_heads)
    k = _heads(z @ mha["key"]["w"].T, num_heads)
    v = _heads(z @ mha["value"]["w"].T, num_heads)
    k_ring = _push_ring(rings["k"], k)
    v_ring = _push_ring(rings["v"], v)
    out = _attn_row(q, k_ring, v_ring, mha["m"], n, dim)
    return out @ mha["proj"]["w"].T, {"k": k_ring, "v": v_ring}


def _layer_step(
    layer: Params, x: jax.Array, rings: Params, n: jax.Array,
    num_heads: int, dim: int, cross: bool,
) -> Tuple[jax.Array, Params]:
    """One pre-LN transformer layer on a single (2, D) frame pair.

    For cross layers, the twin pass (modules.py:278-289) is realized by
    swapping the channel axis of the cross K/V rings: channel 0's query
    reads channel 1's ring and vice versa."""
    new_rings = dict(rings)
    orig = x  # pre-layer value: the cross-attention K/V source
    z = _layer_norm_vec(x, layer["ln_self_attn"])
    sa, sr = _self_attn_step(layer["mha"], z, rings, n, num_heads, dim)
    new_rings.update(sr)
    x = x + sa

    if cross:
        mc = layer["mha_cross"]
        # each channel appends ITS OWN un-normalized pre-layer projections
        ck = _heads(orig @ mc["key"]["w"].T, num_heads)
        cv = _heads(orig @ mc["value"]["w"].T, num_heads)
        ck_ring = _push_ring(rings["ck"], ck)
        cv_ring = _push_ring(rings["cv"], cv)
        new_rings["ck"] = ck_ring
        new_rings["cv"] = cv_ring
        z = _layer_norm_vec(x, layer["ln_src_attn"])
        q = _heads(z @ mc["query"]["w"].T, num_heads)
        # read the OTHER channel's ring
        ca = _attn_row(q, ck_ring[::-1], cv_ring[::-1], mc["m"], n, dim)
        x = x + ca @ mc["proj"]["w"].T

    z = _layer_norm_vec(x, layer["ln_ffnetwork"])
    h = jax.nn.gelu(z @ layer["ffn"]["w_in"]["w"].T, approximate=False)
    x = x + h @ layer["ffn"]["w_out"]["w"].T
    return x, new_rings


def _frame_step(
    params: Params, state: Params, feats: jax.Array, conf: VapConfig
) -> Tuple[Params, Dict[str, jax.Array]]:
    """Advance all caches by one frame; feats: (2, D)."""
    H, D = conf.num_heads, conf.dim
    n = jnp.minimum(state["n"] + 1, state["ar_channel"][0]["k"].shape[2])

    x = feats
    ch_rings = []
    for layer, rings in zip(params["ar_channel"]["layers"], state["ar_channel"]):
        x, r = _layer_step(layer, x, rings, n, H, D, cross=False)
        ch_rings.append(r)

    st_rings = []
    for layer, rings in zip(params["ar"]["layers"], state["ar"]):
        x, r = _layer_step(layer, x, rings, n, H, D, cross=True)
        st_rings.append(r)

    x1, x2 = x[:1][None], x[1:][None]  # (1, 1, D) each
    combined = apply_combinator(params["ar"]["combinator"], x1, x2)

    v1 = x1 @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    v2 = x2 @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    logits = combined @ params["vap_head"]["w"].T + params["vap_head"]["b"]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = {
        "p_now": probs_next_speaker_aggregate(probs, 0, 1)[0, 0],
        "p_future": probs_next_speaker_aggregate(probs, 2, 3)[0, 0],
        "vad": jax.nn.sigmoid(jnp.concatenate([v1, v2], axis=-1))[0, 0],
        "H": entropy_bits(probs)[0, 0],
        "logits": logits[0, 0],
    }
    new_state = {"n": state["n"] + 1, "ar_channel": ch_rings, "ar": st_rings}
    return new_state, out


@partial(jax.jit, static_argnames=("conf",))
def _kv_push(
    params: Params, state: Params, new_feats: jax.Array, conf: VapConfig
) -> Tuple[Params, Dict[str, jax.Array]]:
    """Scan _frame_step over (2, n_new, C) new feature frames."""

    def body(st, f):
        return _frame_step(params, st, f, conf)

    return jax.lax.scan(body, state, jnp.swapaxes(new_feats, 0, 1))


# --------------------------------------------------------------------------
# user-facing streamer
# --------------------------------------------------------------------------
class KVStreamingVap:
    """Incremental stereo VAP with per-layer K/V caches.

    Usage:
        s = KVStreamingVap(model, context_time=20.0)
        s.reset()
        out = s.push(chunk)    # chunk: (2, hop_frames*320) float32
        out["p_now"]           # (n_new, 2) — one row per NEW frame

    Unlike ``StreamingVap`` the outputs cover only the newly produced
    frames, and before the context fills they equal the batch forward on
    the true prefix exactly (no implicit silence context).
    """

    def __init__(
        self,
        model,
        context_time: float = 20.0,
        hop_frames: int = 1,
        encoder_mode: str = "exact",
    ):
        self.model = model
        self.conf: VapConfig = model.conf
        self.hop_frames = hop_frames
        self.hop_samples = hop_frames * SAMPLES_PER_FRAME
        self.context_frames = int(context_time * self.conf.frame_hz)
        self.encoder_mode = encoder_mode
        self._enc = None
        self._enc_state = None
        self.state: Optional[Params] = None
        self.frames_seen = 0

    def reset(self) -> None:
        if self.encoder_mode == "exact":
            self._enc = ExactStreamingEncoder(self.model.params["encoder"], batch=2)
        else:
            self._enc_state = init_encoder_state(self.model.params["encoder"], batch=2)
        self.state = init_kv_state(self.conf, self.context_frames)
        self.frames_seen = 0

    def push(self, chunk: np.ndarray) -> Dict[str, jax.Array]:
        if self.state is None:
            self.reset()
        chunk = jnp.asarray(chunk, dtype=jnp.float32)
        assert chunk.shape == (2, self.hop_samples), (
            f"expected (2, {self.hop_samples}), got {chunk.shape}"
        )
        if self.encoder_mode == "exact":
            new_feats = self._enc.push(chunk)
        else:
            new_feats, self._enc_state = apply_encoder_streaming(
                self.model.params["encoder"], chunk, self._enc_state
            )
        self.state, out = _kv_push(self.model.params, self.state, new_feats, self.conf)
        self.frames_seen += new_feats.shape[1]
        return out

    def push_features(self, new_feats: jax.Array) -> Dict[str, jax.Array]:
        """Advance the transformer caches directly from (2, n, C) features
        (used by tests and by pipelines with their own encoder)."""
        if self.state is None:
            self.reset()
        self.state, out = _kv_push(self.model.params, self.state, new_feats, self.conf)
        self.frames_seen += new_feats.shape[1]
        return out
