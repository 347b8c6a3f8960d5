"""KV-cache streaming VAP: O(1) transformer work per new frame.

The reference SDS loop recomputes the ENTIRE model over a rolling 20 s
window per 20 ms hop (sds/run_sds.py:216-241). ``StreamingVap``
(inference/streaming.py) already makes the encoder incremental but still
re-runs the transformer over the whole context window each hop. Here the
transformer is incremental too: every attention site keeps per-layer K/V
ring buffers, so each new frame costs one attention ROW per site —
(1 x T) scores instead of (T x T) — plus one frame of LN/FFN/head work.

The rings are CIRCULAR (one slot written per frame at a shared rotating
position) rather than shifted, so per-frame HBM traffic is ~57 KB of
ring writes per stream instead of rewriting every ring (~56 MB at the
20 s context). That makes a batched variant practical: all state carries
a leading STREAM axis, so one dispatch advances S concurrent dialogs one
frame — the production serving shape for live turn-taking
(``BatchedKVStreamer``). Streams share the write position but keep
per-stream valid counts, so an individual stream can be reset (a new
call joining a running batch) by zeroing its count alone.

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
  was designed for, reference modules.py:113-158). MEASURED post-fill
  divergence vs window recompute (tests/test_streaming_kv.py drift
  test): ~1e-7 on p_now over 3x-context dialogs, and still ~1e-5 with
  q/k weights scaled 1000x — the slots whose cached values structurally
  differ (the oldest) are exactly the ones ALiBi down-weights hardest in
  the consuming row, so the two modes are numerically interchangeable.

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
from voiceactivityprojection_tpu.inference.streaming import SAMPLES_PER_FRAME
from voiceactivityprojection_tpu.ops.codebook import (
    entropy_bits,
    probs_next_speaker_aggregate,
)
from voiceactivityprojection_tpu.ops.conv import layer_norm

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# state
# --------------------------------------------------------------------------
def _ring(streams: int, num_heads: int, T: int, head_dim: int) -> jax.Array:
    # axes: (stream, speaker-channel, head, time-slot, head-dim)
    return jnp.zeros((streams, 2, num_heads, T, head_dim), dtype=jnp.float32)


def init_kv_state(conf: VapConfig, context_frames: int, streams: int = 1) -> Params:
    """Zeroed K/V rings for every attention site + counters.

    ``steps`` is the shared write cursor (all streams advance in
    lockstep); ``n`` is the per-stream count of valid frames, so one
    stream can be reset independently (set its n to 0)."""
    H = conf.num_heads
    Dh = conf.dim // H
    T = context_frames
    return {
        "steps": jnp.zeros((), dtype=jnp.int32),
        "n": jnp.zeros((streams,), dtype=jnp.int32),
        "ar_channel": [
            {"k": _ring(streams, H, T, Dh), "v": _ring(streams, H, T, Dh)}
            for _ in range(conf.channel_layers)
        ],
        "ar": [
            {
                "k": _ring(streams, H, T, Dh),
                "v": _ring(streams, H, T, Dh),
                # cross rings hold THIS channel's projections of its own
                # pre-layer value; the other channel's query reads them
                "ck": _ring(streams, H, T, Dh),
                "cv": _ring(streams, H, T, Dh),
            }
            for _ in range(conf.cross_layers)
        ],
    }


# --------------------------------------------------------------------------
# single-frame primitives (all carry a leading stream axis S)
# --------------------------------------------------------------------------
def _layer_norm_vec(x: jax.Array, p: Params) -> jax.Array:
    # one owner for the LN math: ops/conv.layer_norm (same eps/casting as
    # the batch forward — exact-prefix parity depends on it)
    return layer_norm(x, p["w"], p["b"])


def _heads(x: jax.Array, num_heads: int) -> jax.Array:
    # (..., D) -> (..., H, Dh)
    return x.reshape(*x.shape[:-1], num_heads, x.shape[-1] // num_heads)


def _write_ring(ring: jax.Array, new: jax.Array, pos: jax.Array) -> jax.Array:
    """Write one (S, 2, H, Dh) frame into time slot `pos` of the ring."""
    return jax.lax.dynamic_update_slice_in_dim(
        ring, new[..., None, :], pos, axis=3
    )


def _attn_row(
    q: jax.Array,       # (S, 2, H, Dh)
    k_ring: jax.Array,  # (S, 2, H, T, Dh)
    v_ring: jax.Array,
    slopes: jax.Array,  # (H,)
    dist: jax.Array,    # (T,) slot age: 0 = just written
    n_valid: jax.Array,  # (S,) valid frames per stream (newest inclusive)
    full_dim: int,
) -> jax.Array:
    """One attention row per stream/channel/head. Returns (S, 2, H*Dh)."""
    scale = 1.0 / math.sqrt(full_dim)  # full-dim quirk (modules.py:52)
    scores = jnp.einsum(
        "schd,schtd->scht", q, k_ring, preferred_element_type=jnp.float32
    ) * scale
    # relative position j - i of a slot with age d is -d
    bias = -jax.lax.stop_gradient(slopes).astype(jnp.float32)[:, None] * dist[None, :]
    scores = scores + bias[None, None]
    valid = dist[None, :] < n_valid[:, None]  # (S, T)
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(v_ring.dtype)
    out = jnp.einsum("scht,schtd->schd", w, v_ring)
    return out.reshape(*out.shape[:-2], -1)


def _layer_step(
    layer: Params, x: jax.Array, rings: Params,
    pos: jax.Array, dist: jax.Array, n_valid: jax.Array,
    num_heads: int, dim: int, cross: bool,
) -> Tuple[jax.Array, Params]:
    """One pre-LN transformer layer on an (S, 2, D) frame batch.

    For cross layers, the twin pass (modules.py:278-289) is realized by
    swapping the channel axis of the cross K/V rings: channel 0's query
    reads channel 1's ring and vice versa."""
    new_rings = dict(rings)
    orig = x  # pre-layer value: the cross-attention K/V source
    z = _layer_norm_vec(x, layer["ln_self_attn"])
    mha = layer["mha"]
    q = _heads(z @ mha["query"]["w"].T, num_heads)
    k_ring = _write_ring(rings["k"], _heads(z @ mha["key"]["w"].T, num_heads), pos)
    v_ring = _write_ring(rings["v"], _heads(z @ mha["value"]["w"].T, num_heads), pos)
    new_rings["k"], new_rings["v"] = k_ring, v_ring
    sa = _attn_row(q, k_ring, v_ring, mha["m"], dist, n_valid, dim)
    x = x + sa @ mha["proj"]["w"].T

    if cross:
        mc = layer["mha_cross"]
        # each channel appends ITS OWN un-normalized pre-layer projections
        ck_ring = _write_ring(
            rings["ck"], _heads(orig @ mc["key"]["w"].T, num_heads), pos
        )
        cv_ring = _write_ring(
            rings["cv"], _heads(orig @ mc["value"]["w"].T, num_heads), pos
        )
        new_rings["ck"], new_rings["cv"] = ck_ring, cv_ring
        z = _layer_norm_vec(x, layer["ln_src_attn"])
        q = _heads(z @ mc["query"]["w"].T, num_heads)
        # read the OTHER channel's ring (swap the channel axis)
        ca = _attn_row(
            q, ck_ring[:, ::-1], cv_ring[:, ::-1], mc["m"], dist, n_valid, dim
        )
        x = x + ca @ mc["proj"]["w"].T

    z = _layer_norm_vec(x, layer["ln_ffnetwork"])
    h = jax.nn.gelu(z @ layer["ffn"]["w_in"]["w"].T, approximate=False)
    x = x + h @ layer["ffn"]["w_out"]["w"].T
    return x, new_rings


def _frame_step(
    params: Params, state: Params, feats: jax.Array, conf: VapConfig
) -> Tuple[Params, Dict[str, jax.Array]]:
    """Advance all caches by one frame; feats: (S, 2, D)."""
    H, D = conf.num_heads, conf.dim
    T = state["ar_channel"][0]["k"].shape[3]
    pos = jnp.mod(state["steps"], T)
    n_valid = jnp.minimum(state["n"] + 1, T)
    # age of slot j after writing at pos: (pos - j) mod T
    dist = jnp.mod(pos - jnp.arange(T), T).astype(jnp.float32)

    x = feats
    ch_rings = []
    for layer, rings in zip(params["ar_channel"]["layers"], state["ar_channel"]):
        x, r = _layer_step(layer, x, rings, pos, dist, n_valid, H, D, cross=False)
        ch_rings.append(r)

    st_rings = []
    for layer, rings in zip(params["ar"]["layers"], state["ar"]):
        x, r = _layer_step(layer, x, rings, pos, dist, n_valid, H, D, cross=True)
        st_rings.append(r)

    x1, x2 = x[:, :1], x[:, 1:]  # (S, 1, D) each
    combined = apply_combinator(params["ar"]["combinator"], x1, x2)

    v1 = x1 @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    v2 = x2 @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    logits = combined @ params["vap_head"]["w"].T + params["vap_head"]["b"]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = {
        "p_now": probs_next_speaker_aggregate(probs, 0, 1)[:, 0],
        "p_future": probs_next_speaker_aggregate(probs, 2, 3)[:, 0],
        "vad": jax.nn.sigmoid(jnp.concatenate([v1, v2], axis=-1))[:, 0],
        "H": entropy_bits(probs)[:, 0],
        "logits": logits[:, 0],
    }
    new_state = {
        "steps": state["steps"] + 1,
        "n": jnp.minimum(state["n"] + 1, T),
        "ar_channel": ch_rings,
        "ar": st_rings,
    }
    return new_state, out


@partial(jax.jit, static_argnames=("conf",))
def _kv_push(
    params: Params, state: Params, new_feats: jax.Array, conf: VapConfig
) -> Tuple[Params, Dict[str, jax.Array]]:
    """Scan _frame_step over (S, 2, n_new, C) new feature frames.

    Output arrays are stacked (n_new, S, ...)."""

    def body(st, f):
        return _frame_step(params, st, f, conf)

    return jax.lax.scan(body, state, jnp.moveaxis(new_feats, 2, 0))


# --------------------------------------------------------------------------
# user-facing streamers
# --------------------------------------------------------------------------
class KVStreamingVap:
    """Incremental stereo VAP with per-layer K/V caches (single stream).

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
        self.state = init_kv_state(self.conf, self.context_frames, streams=1)
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
        return self.push_features(new_feats)

    def push_features(self, new_feats: jax.Array) -> Dict[str, jax.Array]:
        """Advance the transformer caches directly from (2, n, C) features
        (used by tests and by pipelines with their own encoder)."""
        if self.state is None:
            self.reset()
        self.state, out = _kv_push(
            self.model.params, self.state, jnp.asarray(new_feats)[None], self.conf
        )
        self.frames_seen += new_feats.shape[1]
        return {k: v[:, 0] for k, v in out.items()}  # drop the stream axis


class BatchedKVStreamer:
    """S concurrent dialogs advanced one hop per dispatch (serving shape).

    All streams hop in lockstep (they share the ring write cursor); a
    stream can be recycled for a new call with ``reset_stream(i)``, which
    just zeroes its valid-frame count — its stale ring contents are
    masked out. Waveform-level pushes run the exact streaming encoder
    over a (2S)-row batch.

        b = BatchedKVStreamer(model, streams=64, context_time=20.0)
        out = b.push(chunks)   # (S, 2, hop_frames*320)
        out["p_now"]           # (n_new, S, 2)
    """

    def __init__(
        self,
        model,
        streams: int,
        context_time: float = 20.0,
        hop_frames: int = 1,
    ):
        self.model = model
        self.conf: VapConfig = model.conf
        self.streams = streams
        self.hop_frames = hop_frames
        self.hop_samples = hop_frames * SAMPLES_PER_FRAME
        self.context_frames = int(context_time * self.conf.frame_hz)
        self._enc: Optional[ExactStreamingEncoder] = None
        self.state: Optional[Params] = None

    def reset(self) -> None:
        self._enc = ExactStreamingEncoder(
            self.model.params["encoder"], batch=2 * self.streams
        )
        self.state = init_kv_state(self.conf, self.context_frames, self.streams)

    def reset_stream(self, i: int) -> None:
        """Recycle stream slot i for a new dialog: the transformer K/V
        rings are masked by zeroing the valid-frame count, AND the shared
        streaming encoder's per-stream state (conv tails + GRU hidden,
        rows 2i/2i+1) is zeroed — otherwise the new dialog's first seconds
        of features would be conditioned on the previous caller's audio.

        NOT thread-safe vs a concurrent push/push_features (both replace
        whole-state pytrees); callers with multiple threads must serialize
        resets with pushes (VapStreamServer routes them through the tick
        thread)."""
        if self.state is not None:
            self.state["n"] = self.state["n"].at[i].set(0)
        if self._enc is not None:
            self._enc.reset_rows([2 * i, 2 * i + 1])

    def push(self, chunks: np.ndarray) -> Dict[str, jax.Array]:
        if self.state is None:
            self.reset()
        chunks = jnp.asarray(chunks, dtype=jnp.float32)
        S = self.streams
        assert chunks.shape == (S, 2, self.hop_samples), (
            f"expected ({S}, 2, {self.hop_samples}), got {chunks.shape}"
        )
        feats = self._enc.push(chunks.reshape(2 * S, self.hop_samples))
        feats = feats.reshape(S, 2, *feats.shape[1:])  # (S, 2, n_new, C)
        return self.push_features(feats)

    def push_features(self, new_feats: jax.Array) -> Dict[str, jax.Array]:
        if self.state is None:
            self.reset()
        self.state, out = _kv_push(
            self.model.params, self.state, jnp.asarray(new_feats), self.conf
        )
        return out
