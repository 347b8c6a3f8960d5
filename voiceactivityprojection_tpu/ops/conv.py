"""1-D convolution + normalization primitives, feature-last layout.

Everything here operates on (B, T, C) arrays: C=256 sits in TPU lanes and
the strided convs lower to MXU-friendly XLA convolutions
(`lax.conv_general_dilated` with ('NHC','HIO','NHC') dimension numbers).

Behavioral contracts from the reference:
* conv paddings/strides of the CPC feature extractor
  (encoder_components.py:83-92 — symmetric, NOT causal; replicated exactly)
* ChannelNorm with unbiased variance (encoder_components.py:62-70;
  torch `x.var` defaults to correction=1)
* causal left-padded downsample conv (encoder_components.py:453-460)
* channel LayerNorm (encoder_components.py:405-425) — plain LayerNorm over
  the feature axis in this layout, no rearranges needed.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    padding: Tuple[int, int] = (0, 0),
    dilation: int = 1,
) -> jax.Array:
    """x: (B, T, Cin); w: (K, Cin, Cout); returns (B, T', Cout)."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        out = out + b
    return out


def causal_conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """Left-pad (K-1)*dilation, no right pad (encoder_components.py:453-460)."""
    k = w.shape[0]
    pad = (k - 1) * max(dilation, 1)
    return conv1d(x, w, b, stride=stride, padding=(pad, 0), dilation=dilation)


def channel_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Normalize over the feature axis with *unbiased* variance.

    Matches ChannelNorm (encoder_components.py:62-70): torch's `x.var(dim)`
    uses Bessel's correction, unlike LayerNorm. Statistics compute in at
    least float32 (mixed-precision safety; float64 inputs keep float64 for
    the f64 parity chain) and cast back to the input dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.promote_types(dtype, jnp.float32))
    c = x.shape[-1]
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True) * (c / (c - 1))
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * weight + bias).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Standard LayerNorm over the feature axis (biased variance, stats in
    at least f32 — f64 preserved)."""
    dtype = x.dtype
    xf = x.astype(jnp.promote_types(dtype, jnp.float32))
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * weight + bias).astype(dtype)


# --------------------------------------------------------------------------
# initialization (torch-default schemes, for training from scratch)
# --------------------------------------------------------------------------
def init_conv1d(
    key: jax.Array, k: int, c_in: int, c_out: int, bias: bool = True
) -> Params:
    """Kaiming-uniform fan_in (torch Conv1d default)."""
    kw, kb = jax.random.split(key)
    fan_in = c_in * k
    bound = 1.0 / math.sqrt(fan_in)
    w_bound = math.sqrt(6.0 / ((1 + 5.0) * fan_in))  # kaiming_uniform a=sqrt(5)
    p: Params = {
        "w": jax.random.uniform(kw, (k, c_in, c_out), minval=-w_bound, maxval=w_bound)
    }
    if bias:
        p["b"] = jax.random.uniform(kb, (c_out,), minval=-bound, maxval=bound)
    return p


def init_norm(c: int) -> Params:
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,))}
