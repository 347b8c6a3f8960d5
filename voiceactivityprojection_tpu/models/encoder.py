"""CPC audio encoder: 5-layer strided conv stack + GRU + causal downsample.

Pipeline (waveform (B, 1, n_samples) or (B, n_samples) @ 16 kHz):

  conv stack (k=10,8,4,4,4; s=5,4,2,2,2; symmetric pad 3,2,1,1,1;
              ChannelNorm + ReLU after each)          -> 100 Hz, 256 ch
  GRU(256 -> 256)                                     -> contextualized
  causal downsample conv (k=5, s=2, left-pad 4)
      + channel LayerNorm + GELU                      -> 50 Hz, 256 ch

Contracts from the reference: encoder_components.py:73-104 (conv stack,
NOT causal — symmetric padding replicated exactly for checkpoint parity),
encoder_components.py:107-159 (GRU), vap/encoder.py:49-66 +
encoder_components.py:428-499 (downsample = CConv1d + LayerNorm + GELU).

Everything is feature-last (B, T, C). The module is functional:
``init(key) -> params``; ``apply(params, waveform) -> (B, T50, 256)``.

Streaming: ``apply_streaming`` carries (conv tail buffers, GRU hidden,
downsample tail) so the SDS runtime processes 20 ms hops incrementally
instead of recomputing the full 20 s context (reference recomputes:
sds/run_sds.py:241; SURVEY.md §7.10).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.conv import (
    causal_conv1d,
    channel_norm,
    conv1d,
    init_conv1d,
    init_norm,
    layer_norm,
)
from voiceactivityprojection_tpu.ops.gru import gru, init_gru

Params = Dict[str, Any]

# (kernel, stride, pad) per conv layer — fixed by the pretrained CPC
# architecture (encoder_components.py:83-92); total downsampling 160x.
CPC_CONV_SPECS: Tuple[Tuple[int, int, int], ...] = (
    (10, 5, 3),
    (8, 4, 2),
    (4, 2, 1),
    (4, 2, 1),
    (4, 2, 1),
)
CPC_DOWNSAMPLE = 160  # conv stack: 16 kHz -> 100 Hz
DOWNSAMPLE_KERNEL = 5
DOWNSAMPLE_STRIDE = 2  # 100 Hz -> 50 Hz
TOTAL_DOWNSAMPLE = 320


def init_encoder(key: jax.Array, dim: int = 256) -> Params:
    keys = jax.random.split(key, 8)
    convs = []
    c_in = 1
    for i, (k, s, p) in enumerate(CPC_CONV_SPECS):
        convs.append(
            {
                "conv": init_conv1d(keys[i], k, c_in, dim),
                "norm": init_norm(dim),
            }
        )
        c_in = dim
    return {
        "gEncoder": convs,
        "gAR": init_gru(keys[5], dim, dim),
        "downsample": {
            "conv": init_conv1d(keys[6], DOWNSAMPLE_KERNEL, dim, dim),
            "ln": init_norm(dim),
        },
    }


def _conv_stack(params: Params, x: jax.Array, fused_auto: bool = False) -> jax.Array:
    """(B, T, 1) samples -> (B, T/160, C) features @ 100 Hz.

    Implementation dispatch (VAP_CONV_IMPL env overrides; "xla" forces the
    unfused path):
    - "fused_stack" / auto on TPU: ALL five conv layers in one VMEM-resident
      Pallas kernel (ops/conv_stack_fused.py) — no inter-layer HBM traffic.
      Measured on v5e B=64x20s bf16: full forward 84.3 ms vs 88.8 XLA. Auto
      only fires when the caller sets fused_auto (pure inference, rng=None):
      in the train step the XLA convs overlap with the attention backward
      and win (64.4 vs 67.8 ms at B=16), and the kernel's backward would
      recompute the XLA forward for unfrozen encoders anyway.
    - "fused": conv0+conv1 Pallas kernel (ops/conv_fused.py) + XLA rest —
      wins in isolation (43.3 vs 49.3 ms) but ties in the full forward (XLA
      overlaps the unfused convs with attention work); kept for comparison.
    """
    import os

    impl = os.environ.get("VAP_CONV_IMPL")
    if impl is None and fused_auto and jax.default_backend() not in ("cpu",):
        impl = "fused_stack"
    if impl == "fused_stack":
        from voiceactivityprojection_tpu.ops.conv_stack_fused import fused_conv_stack

        return fused_conv_stack(params, x[..., 0])
    start = 0
    if impl == "fused":
        from voiceactivityprojection_tpu.ops.conv_fused import (
            fused_conv01,
            fused_conv01_supported,
        )

        if fused_conv01_supported(params):
            x = fused_conv01(params, x[..., 0])
            start = 2
    for layer, (k, s, p) in zip(params["gEncoder"][start:], CPC_CONV_SPECS[start:]):
        x = conv1d(x, layer["conv"]["w"], layer["conv"]["b"], stride=s, padding=(p, p))
        x = channel_norm(x, layer["norm"]["w"], layer["norm"]["b"])
        x = jax.nn.relu(x)
    return x


def _downsample(params: Params, x: jax.Array) -> jax.Array:
    """(B, T, C) @ 100 Hz -> (B, ceil(T/2), C) @ 50 Hz."""
    d = params["downsample"]
    x = causal_conv1d(x, d["conv"]["w"], d["conv"]["b"], stride=DOWNSAMPLE_STRIDE)
    x = layer_norm(x, d["ln"]["w"], d["ln"]["b"])
    return jax.nn.gelu(x, approximate=False)


def apply_encoder(
    params: Params,
    waveform: jax.Array,
    fused_auto: bool = False,
    fuse_downsample: bool = True,
) -> jax.Array:
    """waveform (B, n) or (B, 1, n) -> (B, T50, C). fused_auto opts the
    conv stack into the fused Pallas kernel on TPU (see _conv_stack);
    fuse_downsample additionally allows the GRU+downsample epilogue kernel
    — callers set it False when the downsample must stay differentiable
    (frozen-encoder TRAINING: the CPC conv/GRU carry no tangents, but the
    downsample trains — reference EncoderCPC.freeze() leaves it out,
    vap/encoder.py:39-42 — and the epilogue kernel has no VJP)."""
    if waveform.ndim == 3:
        assert waveform.shape[1] == 1, f"expected mono channel, got {waveform.shape}"
        waveform = waveform[:, 0]
    x = waveform[..., None]  # (B, n, 1)
    z = _conv_stack(params, x, fused_auto=fused_auto)
    # fused GRU+downsample epilogue kernel (TPU default; VAP_GRU_DS=off
    # opts out): the (B, T, H) GRU output is only consumed by the
    # downsample here, so the fusion keeps it out of HBM entirely.
    # On-chip A/B (v5e, B=64 bf16 encoder stage): 34.7-35.1 ms fused vs
    # 35.0-35.4 unfused, consistent across repeats; outputs match the
    # unfused path (2e-6 f32, mixed-precision-level in bf16).
    # Gated on fused_auto — the kernel has no VJP, and fused_auto is the
    # caller's "no grad flows through the encoder" signal (inference or
    # frozen encoder), exactly like the fused conv stack above.
    import os

    g = params["gAR"]
    hidden = g["w_hh"].shape[0]
    if (
        fused_auto
        and fuse_downsample
        and os.environ.get("VAP_GRU_DS", "fused") == "fused"
        and jax.default_backend() not in ("cpu",)
        and hidden % 128 == 0
        and z.shape[1] % 2 == 0
    ):
        from voiceactivityprojection_tpu.ops.gru_pallas import (
            gru_downsample_fused,
        )

        d = params["downsample"]
        x_proj = z @ g["w_ih"] + g["b_ih"]
        h0 = jnp.zeros((z.shape[0], hidden), dtype=z.dtype)
        return gru_downsample_fused(
            x_proj, g["w_hh"], g["b_hh"], h0,
            d["conv"]["w"], d["conv"]["b"], d["ln"]["w"], d["ln"]["b"],
        )
    z, _ = gru(g, z)
    return _downsample(params, z)


# --------------------------------------------------------------------------
# streaming
# --------------------------------------------------------------------------
class EncoderState(NamedTuple):
    """Carry for incremental encoding.

    conv_tails: per conv layer, the last (k - s) input columns seen
                (symmetric padding means the first chunk is padded left
                with `p` zeros; subsequent chunks consume the tail).
    gru_h:      (B, H) GRU hidden.
    down_tail:  last (k - s) = 3 downsample-input frames.
    """

    conv_tails: Tuple[jax.Array, ...]
    gru_h: jax.Array
    down_tail: jax.Array


def init_encoder_state(params: Params, batch: int, dtype=jnp.float32) -> EncoderState:
    tails = []
    c_in = 1
    dim = params["gAR"]["w_hh"].shape[0]
    for (k, s, p) in CPC_CONV_SPECS:
        # seed with `p` zeros of left padding (symmetric-pad equivalence for
        # the first chunk); tail length must cover k - s overlap
        tails.append(jnp.zeros((batch, max(k - s, p), c_in), dtype=dtype))
        c_in = dim
    return EncoderState(
        conv_tails=tuple(tails),
        gru_h=jnp.zeros((batch, dim), dtype=dtype),
        down_tail=jnp.zeros((batch, DOWNSAMPLE_KERNEL - DOWNSAMPLE_STRIDE, dim), dtype=dtype),
    )


def apply_encoder_streaming(
    params: Params, chunk: jax.Array, state: EncoderState
) -> Tuple[jax.Array, EncoderState]:
    """Incrementally encode a chunk of samples.

    chunk: (B, n) with n a multiple of 320 (one 50 Hz frame = 320 samples).
    Returns (features (B, n/320, C), new state).

    APPROXIMATE fast path: tails are seeded with max(k - s, p) zeros so
    every chunk emits exactly n/320 frames (static shapes, one compiled
    program). Where k - s > p (conv0: 5 vs 3; downsample: 3 vs 4) this
    shifts each layer's input window by a constant few samples relative to
    the symmetrically-padded batch forward, so outputs are a close
    approximation, NOT bit-equal — even in steady state. For bit-exact
    streaming (the SDS default) use models/encoder_streaming_exact.py,
    which reproduces batch-forward frames identically via a prime/steady
    tail pipeline.
    """
    x = chunk[..., None]  # (B, n, 1)
    new_tails = []
    for layer, (k, s, p), tail in zip(
        params["gEncoder"], CPC_CONV_SPECS, state.conv_tails
    ):
        x = jnp.concatenate([tail, x], axis=1)
        keep = max(k - s, 0)
        new_tails.append(x[:, x.shape[1] - keep :] if keep else x[:, :0])
        x = conv1d(x, layer["conv"]["w"], layer["conv"]["b"], stride=s, padding=(0, 0))
        x = channel_norm(x, layer["norm"]["w"], layer["norm"]["b"])
        x = jax.nn.relu(x)

    z, h = gru(params["gAR"], x, state.gru_h)

    d = params["downsample"]
    zc = jnp.concatenate([state.down_tail, z], axis=1)
    keep = DOWNSAMPLE_KERNEL - DOWNSAMPLE_STRIDE
    down_tail = zc[:, zc.shape[1] - keep :]
    y = conv1d(zc, d["conv"]["w"], d["conv"]["b"], stride=DOWNSAMPLE_STRIDE, padding=(0, 0))
    y = layer_norm(y, d["ln"]["w"], d["ln"]["b"])
    y = jax.nn.gelu(y, approximate=False)
    return y, EncoderState(tuple(new_tails), h, down_tail)
