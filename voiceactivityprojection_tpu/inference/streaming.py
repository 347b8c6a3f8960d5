"""Streaming (real-time) VAP inference.

The reference SDS loop re-runs the ENTIRE model over a rolling 20 s
waveform buffer on every 20 ms audio callback (sds/run_sds.py:216-241) —
the CPC conv stack + GRU recompute 20 s of features to produce one new
frame. Here:

* the encoder runs INCREMENTALLY — by default through the EXACT streaming
  encoder (models/encoder_streaming_exact.py), whose frames are
  bit-identical to the batch forward (symmetric-pad semantics preserved
  via a prime/steady two-phase pipeline); a strictly-causal variant
  (models/encoder.py `apply_encoder_streaming`) is available with
  `encoder_mode="causal"`;
* encoded features roll through a fixed (2, context_frames, C) ring buffer
  (device-side), so the transformer always sees one static shape — one XLA
  compilation, no recompiles as context fills;
* the transformer + heads re-run over the feature window per hop (cheap:
  1.77 ms on a v5e chip for a 20 s context at full model size).

Zero-initialized feature buffers correspond to silence context, matching
the reference's zero-initialized waveform ring (sds/run_sds.py:206-214).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

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
from voiceactivityprojection_tpu.models.transformer import apply_gpt, apply_gpt_stereo
from voiceactivityprojection_tpu.models.vap import Params
from voiceactivityprojection_tpu.ops.codebook import (
    entropy_bits,
    probs_next_speaker_aggregate,
)

SAMPLES_PER_FRAME = 320  # 16 kHz / 50 Hz


@partial(jax.jit, static_argnames=("conf", "hop_frames"))
def _window_step(
    params: Params,
    feats: jax.Array,      # (2, context_frames, C) ring buffer
    new_feats: jax.Array,  # (2, hop_frames, C)
    conf: VapConfig,
    hop_frames: int,
):
    """Roll the feature ring and run the transformer + heads over it."""
    feats = jnp.roll(feats, -hop_frames, axis=1)
    feats = feats.at[:, -hop_frames:].set(new_feats)

    x1, x2 = feats[:1], feats[1:]
    o1 = apply_gpt(params["ar_channel"], x1, num_heads=conf.num_heads,
                   attn_impl=conf.attn_impl)
    o2 = apply_gpt(params["ar_channel"], x2, num_heads=conf.num_heads,
                   attn_impl=conf.attn_impl)
    out = apply_gpt_stereo(params["ar"], o1["x"], o2["x"],
                           num_heads=conf.num_heads, attn_impl=conf.attn_impl)

    v1 = out["x1"] @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    v2 = out["x2"] @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    logits = out["x"] @ params["vap_head"]["w"].T + params["vap_head"]["b"]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ret = {
        "p_now": probs_next_speaker_aggregate(probs, 0, 1)[0],
        "p_future": probs_next_speaker_aggregate(probs, 2, 3)[0],
        "vad": jax.nn.sigmoid(jnp.concatenate([v1, v2], axis=-1))[0],
        "H": entropy_bits(probs)[0],
    }
    return feats, ret


@jax.jit
def _causal_encode(params, chunk, enc_state):
    return apply_encoder_streaming(params["encoder"], chunk, enc_state)


class StreamingVap:
    """Incremental stereo VAP over a rolling context window.

    Usage:
        s = StreamingVap(model, context_time=20.0, hop_frames=1)
        s.reset()
        out = s.push(chunk)   # chunk: (2, hop_frames*320) float32
        out["p_now"]          # (context_frames, 2) — last rows are newest

    encoder_mode: "exact" (default — frames equal the batch forward) or
    "causal" (no symmetric-pad lookahead; ~10 ms earlier, slightly offset
    features).
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
        self.feats = None
        self.frames_seen = 0

    def reset(self) -> None:
        if self.encoder_mode == "exact":
            self._enc = ExactStreamingEncoder(self.model.params["encoder"], batch=2)
        else:
            self._enc_state = init_encoder_state(self.model.params["encoder"], batch=2)
        self.feats = jnp.zeros(
            (2, self.context_frames, self.conf.dim), dtype=jnp.float32
        )
        self.frames_seen = 0

    def push(self, chunk: np.ndarray) -> Dict[str, jax.Array]:
        """Process hop_frames*320 new samples per channel; returns the
        window outputs (last rows = newly produced frames)."""
        if self.feats is None:
            self.reset()
        chunk = jnp.asarray(chunk, dtype=jnp.float32)
        assert chunk.shape == (2, self.hop_samples), (
            f"expected (2, {self.hop_samples}), got {chunk.shape}"
        )
        if self.encoder_mode == "exact":
            new_feats = self._enc.push(chunk)
        else:
            new_feats, self._enc_state = _causal_encode(
                self.model.params, chunk, self._enc_state
            )
        n_new = new_feats.shape[1]
        self.feats, out = _window_step(
            self.model.params, self.feats, new_feats, self.conf, n_new
        )
        self.frames_seen += n_new
        return out

    @property
    def warmed_up(self) -> bool:
        return self.frames_seen >= self.context_frames
