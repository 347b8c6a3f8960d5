"""Streaming (real-time) VAP inference.

The reference SDS loop re-runs the ENTIRE model over a rolling 20 s
waveform buffer on every 20 ms audio callback (sds/run_sds.py:216-241) —
the CPC conv stack + GRU recompute 20 s of features to produce one new
frame. Here:

* the encoder runs INCREMENTALLY: conv tails + GRU carry persist in an
  `EncoderState` (models/encoder.py), so each hop costs O(hop) not O(20 s);
  both channels ride one batch-2 encoder call;
* encoded features roll through a fixed (1, context_frames, C) ring buffer
  (device-side), so the transformer always sees one static shape — one XLA
  compilation, no recompiles as context fills;
* the transformer + heads re-run over the feature window per hop (cheap:
  features are 50 Hz; 20 s = 1000 frames).

Zero-initialized feature buffers correspond to silence context, matching
the reference's zero-initialized waveform ring (sds/run_sds.py:206-214).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.encoder import (
    EncoderState,
    apply_encoder_streaming,
    init_encoder_state,
)
from voiceactivityprojection_tpu.models.transformer import apply_gpt, apply_gpt_stereo
from voiceactivityprojection_tpu.models.vap import Params
from voiceactivityprojection_tpu.ops.codebook import (
    entropy_bits,
    probs_next_speaker_aggregate,
)

SAMPLES_PER_FRAME = 320  # 16 kHz / 50 Hz


class StreamState(NamedTuple):
    enc: EncoderState         # batch-2 encoder carry (one row per channel)
    feats: jax.Array          # (2, context_frames, C) rolling features
    frames_seen: jax.Array    # () int32 — total frames pushed so far


@partial(jax.jit, static_argnames=("conf", "hop_frames"))
def _stream_step(
    params: Params,
    state: StreamState,
    chunk: jax.Array,  # (2, hop_frames * 320) new stereo samples
    conf: VapConfig,
    hop_frames: int,
) -> Tuple[StreamState, Dict[str, jax.Array]]:
    new_feats, enc = apply_encoder_streaming(params["encoder"], chunk, state.enc)
    # roll the ring buffer left by hop_frames, append the new features
    feats = jnp.roll(state.feats, -hop_frames, axis=1)
    feats = feats.at[:, -hop_frames:].set(new_feats)

    x1 = feats[:1]
    x2 = feats[1:]
    o1 = apply_gpt(params["ar_channel"], x1, num_heads=conf.num_heads,
                   attn_impl=conf.attn_impl)
    o2 = apply_gpt(params["ar_channel"], x2, num_heads=conf.num_heads,
                   attn_impl=conf.attn_impl)
    out = apply_gpt_stereo(params["ar"], o1["x"], o2["x"],
                           num_heads=conf.num_heads, attn_impl=conf.attn_impl)

    v1 = out["x1"] @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    v2 = out["x2"] @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    logits = out["x"] @ params["vap_head"]["w"].T + params["vap_head"]["b"]

    probs = jax.nn.softmax(logits, axis=-1)
    ret = {
        "p_now": probs_next_speaker_aggregate(probs, 0, 1)[0],
        "p_future": probs_next_speaker_aggregate(probs, 2, 3)[0],
        "vad": jax.nn.sigmoid(jnp.concatenate([v1, v2], axis=-1))[0],
        "H": entropy_bits(probs)[0],
    }
    new_state = StreamState(enc, feats, state.frames_seen + hop_frames)
    return new_state, ret


class StreamingVap:
    """Incremental stereo VAP over a rolling context window.

    Usage:
        s = StreamingVap(model, context_time=20.0, hop_frames=1)
        s.reset()
        out = s.push(chunk)   # chunk: (2, hop_frames*320) float32
        out["p_now"]          # (context_frames, 2) — last row is newest
    """

    def __init__(self, model, context_time: float = 20.0, hop_frames: int = 1):
        self.model = model
        self.conf: VapConfig = model.conf
        self.hop_frames = hop_frames
        self.hop_samples = hop_frames * SAMPLES_PER_FRAME
        self.context_frames = int(context_time * self.conf.frame_hz)
        self.state: Optional[StreamState] = None

    def reset(self) -> None:
        enc = init_encoder_state(self.model.params["encoder"], batch=2)
        feats = jnp.zeros(
            (2, self.context_frames, self.conf.dim), dtype=jnp.float32
        )
        self.state = StreamState(enc, feats, jnp.zeros((), jnp.int32))

    def push(self, chunk: np.ndarray) -> Dict[str, np.ndarray]:
        """Process hop_frames*320 new samples per channel; returns the
        window outputs (last row = the newly produced frame)."""
        if self.state is None:
            self.reset()
        chunk = jnp.asarray(chunk, dtype=jnp.float32)
        assert chunk.shape == (2, self.hop_samples), (
            f"expected (2, {self.hop_samples}), got {chunk.shape}"
        )
        self.state, out = _stream_step(
            self.model.params, self.state, chunk, self.conf, self.hop_frames
        )
        return out

    @property
    def warmed_up(self) -> bool:
        return self.state is not None and int(self.state.frames_seen) >= self.context_frames
