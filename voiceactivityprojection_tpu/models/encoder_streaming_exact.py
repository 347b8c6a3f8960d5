"""Exact-parity streaming encoder.

`apply_encoder_streaming` (models/encoder.py) is strictly causal and
therefore offset from the batch forward: the reference CPC conv stack uses
SYMMETRIC padding (encoder_components.py:83-92), so frame t depends on a
few future samples. This module reproduces the batch outputs EXACTLY by
accepting that lookahead (~153 samples ≈ 9.6 ms) as latency:

* PRIME call (first chunk): each conv layer starts from its symmetric left
  padding `p` and emits a few frames fewer than steady state while the
  pipeline fills (layer l's deficit cascades downward).
* STEADY calls: every layer's retained-tail length has converged to a
  constant L*, consumption advances by exactly `s * outputs` per push,
  and each push emits hop_frames frames — bit-identical to the batch
  forward's frames at the same indices.

CAVEAT (TPU defaults): "bit-identical" holds vs the UNFUSED batch path
(`VAP_GRU_DS=off`, or any CPU run). With the TPU-default fused
GRU+downsample epilogue (`ops/gru_pallas.py` `gru_downsample_fused`) the
batch forward's epilogue math is reassociated inside the kernel and
differs from the unfused math this streaming path uses by ~2e-6 f32
(mixed-precision-level; measured in the on-chip A/B, ROADMAP.md #5).

Tail lengths (kernel k, stride s, pad p; chunk multiple of 320 samples):

  layer        k  s  p   prime-len  steady-len
  conv0       10  5  3       3          8
  conv1        8  4  2       2          5
  conv2..4     4  2  1       1          2
  downsample   5  2  4(L)    4          3

Buffers are allocated at max(prime, steady) length; the prime pass slices
a static offset. Two jitted paths (prime / steady) share the state pytree,
so shapes stay static.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.models.encoder import (
    CPC_CONV_SPECS,
    DOWNSAMPLE_KERNEL,
    DOWNSAMPLE_STRIDE,
)
from voiceactivityprojection_tpu.ops.conv import channel_norm, conv1d, layer_norm
from voiceactivityprojection_tpu.ops.gru import gru

Params = Dict[str, Any]

# Per-layer (steady_tail, prime_tail): prime_tail is the symmetric left pad
# p; steady_tail is the leftover after the prime chunk (invariant afterwards
# and independent of hop size — verified by the chunk-invariance test).
# Computed by chaining the prime pass for a 320-sample (1-frame) hop.
def _compute_tails() -> Tuple[List[Tuple[int, int]], int, int]:
    conv_tails = []
    c = 320
    for (k, s, p) in CPC_CONV_SPECS:
        o = (p + c - k) // s + 1
        leftover = p + c - s * o
        conv_tails.append((leftover, p))
        c = o
    down_prime = DOWNSAMPLE_KERNEL - 1  # causal left pad 4
    o = (down_prime + c - DOWNSAMPLE_KERNEL) // DOWNSAMPLE_STRIDE + 1
    down_steady = down_prime + c - DOWNSAMPLE_STRIDE * o
    return conv_tails, down_prime, down_steady


_CONV_TAILS, _DOWN_PRIME, _DOWN_STEADY = _compute_tails()


class ExactStreamState(NamedTuple):
    conv_tails: Tuple[jax.Array, ...]  # (B, steady_or_max_len, C) each
    gru_h: jax.Array
    down_tail: jax.Array               # (B, max(_DOWN_PRIME, _DOWN_STEADY), C)


def init_exact_state(params: Params, batch: int, dtype=jnp.float32) -> ExactStreamState:
    tails = []
    c_in = 1
    dim = params["gAR"]["w_hh"].shape[0]
    for (steady, prime) in _CONV_TAILS:
        tails.append(jnp.zeros((batch, max(steady, prime), c_in), dtype=dtype))
        c_in = dim
    return ExactStreamState(
        conv_tails=tuple(tails),
        gru_h=jnp.zeros((batch, dim), dtype=dtype),
        down_tail=jnp.zeros((batch, max(_DOWN_PRIME, _DOWN_STEADY), dim), dtype=dtype),
    )


def _run_pipeline(params: Params, x: jax.Array, state: ExactStreamState, prime: bool):
    new_tails = []
    for layer, (k, s, p), tail, (steady, prime_len) in zip(
        params["gEncoder"], CPC_CONV_SPECS, state.conv_tails, _CONV_TAILS
    ):
        use = prime_len if prime else steady
        buf = jnp.concatenate([tail[:, tail.shape[1] - use :], x], axis=1)
        n_out = (buf.shape[1] - k) // s + 1
        consumed = s * n_out
        leftover = buf[:, consumed:]
        # re-pack leftover into the fixed-size tail (left-pad with zeros;
        # zeros are never consumed again because future slices skip them)
        keep = tail.shape[1]
        pad = keep - leftover.shape[1]
        if pad > 0:
            leftover = jnp.concatenate(
                [jnp.zeros((buf.shape[0], pad, buf.shape[2]), buf.dtype), leftover],
                axis=1,
            )
        else:
            leftover = leftover[:, -keep:]
        new_tails.append(leftover)

        x = conv1d(buf, layer["conv"]["w"], layer["conv"]["b"], stride=s, padding=(0, 0))
        x = channel_norm(x, layer["norm"]["w"], layer["norm"]["b"])
        x = jax.nn.relu(x)

    z, h = gru(params["gAR"], x, state.gru_h)

    d = params["downsample"]
    use = _DOWN_PRIME if prime else _DOWN_STEADY
    buf = jnp.concatenate(
        [state.down_tail[:, state.down_tail.shape[1] - use :], z], axis=1
    )
    n_out = (buf.shape[1] - DOWNSAMPLE_KERNEL) // DOWNSAMPLE_STRIDE + 1
    leftover = buf[:, DOWNSAMPLE_STRIDE * n_out :]
    keep = state.down_tail.shape[1]
    pad = keep - leftover.shape[1]
    if pad > 0:
        leftover = jnp.concatenate(
            [jnp.zeros((buf.shape[0], pad, buf.shape[2]), buf.dtype), leftover], axis=1
        )
    else:
        leftover = leftover[:, -keep:]

    y = conv1d(buf, d["conv"]["w"], d["conv"]["b"], stride=DOWNSAMPLE_STRIDE, padding=(0, 0))
    y = layer_norm(y, d["ln"]["w"], d["ln"]["b"])
    y = jax.nn.gelu(y, approximate=False)
    return y, ExactStreamState(tuple(new_tails), h, leftover)


@partial(jax.jit, static_argnames=("prime",))
def _exact_step(params, chunk, state, prime: bool):
    return _run_pipeline(params, chunk[..., None], state, prime)


class ExactStreamingEncoder:
    """Stateful wrapper: push chunks (B, n) with n a multiple of 320.

    The first push returns one frame fewer than steady pushes (the
    pipeline's ~10 ms lookahead); afterwards every push returns n/320
    frames that EXACTLY equal the batch `apply_encoder` outputs at the
    same frame indices.
    """

    def __init__(self, params: Params, batch: int = 1, dtype=jnp.float32):
        self.params = params
        self.batch = batch
        self.dtype = dtype
        self.reset()

    def reset(self) -> None:
        self.state = init_exact_state(self.params, self.batch, self.dtype)
        self.primed = False
        self.frames_emitted = 0

    def reset_rows(self, rows) -> None:
        """Zero the per-stream encoder state of the given batch rows —
        conv tails, GRU hidden, downsample tail — so a recycled serving
        slot is NOT conditioned on the previous dialog's audio. The GRU
        reset is exact-fresh; the zeroed conv tails behave as if the new
        dialog were preceded by silence at each layer boundary, converging
        to the batch-exact features once the tails flush (< the conv
        stack's ~0.12 s receptive field)."""
        rows = jnp.asarray(rows, dtype=jnp.int32)
        st = self.state
        self.state = ExactStreamState(
            conv_tails=tuple(t.at[rows].set(0.0) for t in st.conv_tails),
            gru_h=st.gru_h.at[rows].set(0.0),
            down_tail=st.down_tail.at[rows].set(0.0),
        )

    def push(self, chunk: jax.Array) -> jax.Array:
        chunk = jnp.asarray(chunk, dtype=self.dtype)
        assert chunk.ndim == 2 and chunk.shape[1] % 320 == 0, (
            f"chunk must be (B, n*320), got {chunk.shape}"
        )
        y, self.state = _exact_step(self.params, chunk, self.state, not self.primed)
        self.primed = True
        self.frames_emitted += y.shape[1]
        return y
