"""Multi-head causal attention with ALiBi biases.

Parity notes vs the reference (vap/modules.py:24-202):

* scale = 1/sqrt(FULL model dim), not head dim — a quirk of the reference
  (modules.py:52) that must be replicated for checkpoint parity.
* ALiBi bias as implemented there is ``m_h * j`` for key position j plus a
  causal -inf mask (modules.py:169-187). Since softmax is shift-invariant
  per query row, this equals the canonical ``m_h * (j - i)``; we use the
  canonical form (better numerics for long T, identical probabilities).
* Slopes follow Press et al.'s power-of-2 recipe (modules.py:124-158) and
  live in the param tree as non-trainable "m" (they are present in the
  reference state dict, modules.py:116-121).

Two implementations:
* ``attention_dense`` — O(T^2) materialized, optionally returns weights
  (for analysis/plotting parity with reference `attention=True`).
* ``attention`` — dispatches to the Pallas flash kernel on TPU for long
  sequences, else the dense path.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Press et al. ALiBi slopes (contract of vap/modules.py:124-158)."""

    def power_of_2(n: int):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        slopes = power_of_2(num_heads)
    else:
        closest = 2 ** math.floor(math.log2(num_heads))
        slopes = (
            power_of_2(closest)
            + alibi_slopes(2 * closest).tolist()[0::2][: num_heads - closest]
        )
    return jnp.asarray(slopes, dtype=jnp.float32)


def init_mha(key: jax.Array, dim: int, num_heads: int, std: float = 0.02) -> Params:
    """QKV + output projections, all bias-free (modules.py:38-51), GPT-2
    normal(0.02) init (modules.py:333-340); slopes stored as 'm'."""
    ks = jax.random.split(key, 4)
    shape = (dim, dim)
    return {
        "query": {"w": std * jax.random.normal(ks[0], shape)},
        "key": {"w": std * jax.random.normal(ks[1], shape)},
        "value": {"w": std * jax.random.normal(ks[2], shape)},
        "proj": {"w": std * jax.random.normal(ks[3], shape)},
        "m": alibi_slopes(num_heads),
    }


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, T, D = x.shape
    return x.reshape(B, T, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    B, H, T, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)


def attention_dense(
    params: Params,
    q_in: jax.Array,
    kv_in: jax.Array,
    num_heads: int,
    return_weights: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """q_in: (B, T, D) queries source; kv_in: (B, S, D) keys/values source.

    Causal masking assumes T == S with aligned positions (self- or
    cross-attention over the same timeline, as in the stereo model).
    """
    B, T, D = q_in.shape
    scale = 1.0 / math.sqrt(D)  # full-dim scale (modules.py:52)

    q = _split_heads(q_in @ params["query"]["w"].T, num_heads)
    k = _split_heads(kv_in @ params["key"]["w"].T, num_heads)
    v = _split_heads(kv_in @ params["value"]["w"].T, num_heads)

    # scores + softmax in at least f32 (f64 inputs keep f64 for parity)
    scores = jnp.einsum(
        "bhid,bhjd->bhij", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
    ) * scale
    i = jnp.arange(T)[:, None]
    j = jnp.arange(kv_in.shape[1])[None, :]
    # slopes are non-trainable in the reference (requires_grad=False,
    # modules.py:116-121): no gradient may flow into them
    slopes = jax.lax.stop_gradient(params["m"]).astype(scores.dtype)
    bias = slopes[:, None, None] * (j - i)[None, :, :]
    scores = scores + bias
    scores = jnp.where(j <= i, scores, -jnp.inf)

    training = dropout_rate > 0.0 and dropout_key is not None
    if v.dtype == jnp.bfloat16 and not return_weights and not training:
        # bf16 score storage: the (B, H, T, T) score/weight arrays are the
        # only O(T^2) HBM traffic in the model; storing them bf16 (max/exp
        # still per-element f32, fused by XLA) halves it. Measured on v5e
        # at (B=64, H=4, T=1000): 3.4 ms vs 5.3 ms per pass, with output
        # error at the bf16-output quantization level (4e-3, identical to
        # the flash kernel's). Inference/eval only: the decomposed softmax
        # breaks XLA's fused softmax-grad pattern and slows the training
        # backward (measured 151 vs 133 ms/step at B=16), so the dropout
        # path keeps the f32 softmax. The f32 path below stays bit-exact
        # for parity and analysis (return_weights).
        s16 = jnp.maximum(scores, jnp.float32(-1e30)).astype(jnp.bfloat16)
        m = s16.max(axis=-1, keepdims=True)
        e = jnp.exp((s16 - m).astype(jnp.float32)).astype(jnp.bfloat16)
        l = e.astype(jnp.float32).sum(axis=-1, keepdims=True)
        weights = (e.astype(jnp.float32) / l).astype(v.dtype)
    else:
        weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    w = weights
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, w.shape)
        w = jnp.where(keep, w / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhij,bhjd->bhid", w, v)
    out = _merge_heads(out) @ params["proj"]["w"].T
    return out, (weights if return_weights else None)


def attention(
    params: Params,
    q_in: jax.Array,
    kv_in: jax.Array,
    num_heads: int,
    impl: str = "auto",
    return_weights: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Dispatching attention entry point.

    impl="pallas" uses the fused flash kernel (TPU only, no weights out,
    no attention dropout); "xla" forces the dense path; "auto" picks
    pallas on TPU when weights aren't requested and dropout is off.
    """
    training = dropout_rate > 0.0 and dropout_key is not None
    use_pallas = False
    if impl == "pallas":
        if return_weights:
            raise ValueError(
                "impl='pallas' cannot return attention weights (the flash "
                "kernel never materializes them); use impl='auto' or 'xla'"
            )
        use_pallas = True
    elif impl == "auto":
        # measured on v5e at (B=64, H=4, T=1000, bf16) per attention pass:
        # flash 1024/1024 blocks = 3.15 ms, dense with bf16 score storage
        # = 3.39 ms, dense f32 = 5.29 ms — the O(T^2) score HBM traffic is
        # the model's top cost, so flash wins at every size on TPU (and is
        # the only option once scores exceed HBM for long single-shot
        # audio). With attention dropout (training) the flash TRAIN kernel
        # applies the mask in-kernel from a coordinate hash and runs a
        # flash backward — no (B, H, T, T) scores/weights/masks in HBM
        # either way. Dense remains for: CPU (interpret mode is slow) and
        # weight outputs (analysis/plots).
        use_pallas = (
            not return_weights
            and jax.default_backend() not in ("cpu",)
        )
    if use_pallas:
        D = q_in.shape[-1]
        scale = 1.0 / math.sqrt(D)
        q = _split_heads(q_in @ params["query"]["w"].T, num_heads)
        k = _split_heads(kv_in @ params["key"]["w"].T, num_heads)
        v = _split_heads(kv_in @ params["value"]["w"].T, num_heads)
        slopes = jax.lax.stop_gradient(params["m"])
        if training:
            from voiceactivityprojection_tpu.ops.flash_alibi_train import (
                flash_alibi_attention_train,
            )

            seed = jax.random.randint(
                dropout_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            out = flash_alibi_attention_train(
                q, k, v, slopes, seed, scale, float(dropout_rate)
            )
        else:
            from voiceactivityprojection_tpu.ops.flash_alibi import (
                flash_alibi_attention,
            )

            out = flash_alibi_attention(q, k, v, slopes, scale)
        out = _merge_heads(out) @ params["proj"]["w"].T
        return out, None
    return attention_dense(
        params,
        q_in,
        kv_in,
        num_heads,
        return_weights=return_weights,
        dropout_rate=dropout_rate,
        dropout_key=dropout_key,
    )
