"""GPT-style transformer stacks with ALiBi attention.

Mirrors the reference architecture (vap/modules.py:205-449) with a
functional JAX design:

* pre-LN block: LN -> self-attn -> residual
  [-> LN -> cross-attn(Q=x, K=V=src with src deliberately UN-normalized,
   modules.py:266-272) -> residual]
  -> LN -> FFN(GELU, dff = 3*dim, no biases, modules.py:9-21) -> residual
* stereo layer runs the same weights twice with (x1, x2) roles swapped
  (modules.py:278-289)
* ``Combinator`` fuses the two towers: per-channel bias-free linear +
  shared LayerNorm + GELU, summed (modules.py:434-449)
* GPT-2 init: normal(0.02) linears, LN ones/zeros (modules.py:333-340)

Dropout (rate from config) is applied at the same sites as the reference:
on attention weights, after the output projection, on each residual branch,
and inside the FFN — only when a PRNG key is provided (training).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.attention import attention, init_mha
from voiceactivityprojection_tpu.ops.conv import init_norm, layer_norm

Params = Dict[str, Any]


def _dropout(x, rate, key):
    if rate <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _init_linear(key, d_in, d_out, std=0.02):
    return {"w": std * jax.random.normal(key, (d_out, d_in))}


def init_transformer_layer(
    key: jax.Array,
    dim: int,
    ffn_dim: int,
    num_heads: int,
    cross_attention: bool = False,
) -> Params:
    ks = jax.random.split(key, 5)
    p: Params = {
        "ln_self_attn": init_norm(dim),
        "ln_ffnetwork": init_norm(dim),
        "mha": init_mha(ks[0], dim, num_heads),
        "ffn": {
            "w_in": _init_linear(ks[1], dim, ffn_dim),
            "w_out": _init_linear(ks[2], ffn_dim, dim),
        },
    }
    if cross_attention:
        p["ln_src_attn"] = init_norm(dim)
        p["mha_cross"] = init_mha(ks[3], dim, num_heads)
    return p


def _ffn(params: Params, x: jax.Array, rate: float, key) -> jax.Array:
    h = x @ params["w_in"]["w"].T
    h = jax.nn.gelu(h, approximate=False)
    h = _dropout(h, rate, key)
    return h @ params["w_out"]["w"].T


def apply_transformer_layer(
    params: Params,
    x: jax.Array,
    src: Optional[jax.Array] = None,
    *,
    num_heads: int,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    return_weights: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Returns (x, self_attn_weights, cross_attn_weights)."""
    keys = jax.random.split(rng, 8) if rng is not None else [None] * 8

    z = layer_norm(x, params["ln_self_attn"]["w"], params["ln_self_attn"]["b"])
    sa, sa_w = attention(
        params["mha"], z, z, num_heads,
        impl=attn_impl, return_weights=return_weights,
        dropout_rate=dropout, dropout_key=keys[0],
    )
    sa = _dropout(sa, dropout, keys[1])  # resid_drop (modules.py:109)
    x = x + _dropout(sa, dropout, keys[2])  # layer dropout (modules.py:261)

    ca_w = None
    if src is not None and "mha_cross" in params:
        z = layer_norm(x, params["ln_src_attn"]["w"], params["ln_src_attn"]["b"])
        ca, ca_w = attention(
            params["mha_cross"], z, src, num_heads,
            impl=attn_impl, return_weights=return_weights,
            dropout_rate=dropout, dropout_key=keys[3],
        )
        ca = _dropout(ca, dropout, keys[4])
        x = x + _dropout(ca, dropout, keys[5])

    z = layer_norm(x, params["ln_ffnetwork"]["w"], params["ln_ffnetwork"]["b"])
    x = x + _dropout(_ffn(params["ffn"], z, dropout, keys[6]), dropout, keys[7])
    return x, sa_w, ca_w


def apply_stereo_layer(
    params: Params,
    x1: jax.Array,
    x2: jax.Array,
    *,
    num_heads: int,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    return_weights: bool = False,
):
    """Shared-weight twin pass with swapped roles (modules.py:278-289)."""
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    z1, sa1, ca1 = apply_transformer_layer(
        params, x1, src=x2, num_heads=num_heads, dropout=dropout, rng=r1,
        attn_impl=attn_impl, return_weights=return_weights,
    )
    z2, sa2, ca2 = apply_transformer_layer(
        params, x2, src=x1, num_heads=num_heads, dropout=dropout, rng=r2,
        attn_impl=attn_impl, return_weights=return_weights,
    )
    return z1, z2, (sa1, ca1, sa2, ca2)


# --------------------------------------------------------------------------
# GPT stacks
# --------------------------------------------------------------------------
def init_gpt(
    key: jax.Array,
    dim: int,
    num_layers: int,
    num_heads: int,
    dff_k: int = 3,
) -> Params:
    ks = jax.random.split(key, num_layers)
    return {
        "layers": [
            init_transformer_layer(k, dim, int(dim * dff_k), num_heads)
            for k in ks
        ]
    }


def apply_gpt(
    params: Params,
    x: jax.Array,
    *,
    num_heads: int,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    attention_out: bool = False,
) -> Dict[str, jax.Array]:
    attns: List[jax.Array] = []
    n = len(params["layers"])
    keys = jax.random.split(rng, n) if rng is not None else [None] * n
    for layer, k in zip(params["layers"], keys):
        x, sa, _ = apply_transformer_layer(
            layer, x, num_heads=num_heads, dropout=dropout, rng=k,
            attn_impl=attn_impl, return_weights=attention_out,
        )
        if attention_out:
            attns.append(sa)
    ret = {"x": x}
    if attention_out:
        ret["attn"] = jnp.stack(attns, axis=1)  # (B, L, H, T, T)
    return ret


def apply_gpt_stereo_batched(
    params: Params,
    x12: jax.Array,
    *,
    num_heads: int,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
) -> Dict[str, jax.Array]:
    """Shared-weight stereo stack on channel-stacked input (2B, T, C).

    Mathematically identical to ``apply_gpt_stereo`` on the split halves:
    the twin pass (modules.py:278-289) runs the same weights on (x1,
    src=x2) and (x2, src=x1), where src is the other channel's PRE-layer
    value — stacking [x1; x2] along batch makes both passes one dispatch,
    with cross-attention K/V realized as a half-swap of the stacked batch.
    Halves kernel launches and doubles matmul M-dims vs the twin pass.
    Only the dropout RNG pattern differs (still i.i.d. Bernoulli per
    site). No attention-weight outputs — analysis uses the twin pass.

    MEASURED (v5e, T=1000 bf16): NOT wired as the default — slower than
    the twin pass at B=64 (stereo stack 42.2 vs 33.8 ms; full forward
    84.5 vs 75.6) and tied at B=1/8: the two independent twin chains give
    XLA cross-chain ILP that hides HBM latency better than one wider
    chain. Kept for completeness/experiments.
    """
    B2 = x12.shape[0]
    assert B2 % 2 == 0, f"stacked stereo batch must be even, got {B2}"
    B = B2 // 2
    swap = lambda t: jnp.concatenate([t[B:], t[:B]], axis=0)
    n = len(params["layers"])
    keys = jax.random.split(rng, n) if rng is not None else [None] * n
    for layer, k in zip(params["layers"], keys):
        ks = jax.random.split(k, 8) if k is not None else [None] * 8
        orig = x12
        z = layer_norm(x12, layer["ln_self_attn"]["w"], layer["ln_self_attn"]["b"])
        sa, _ = attention(
            layer["mha"], z, z, num_heads,
            impl=attn_impl, dropout_rate=dropout, dropout_key=ks[0],
        )
        sa = _dropout(sa, dropout, ks[1])
        x12 = x12 + _dropout(sa, dropout, ks[2])
        # cross-attention: Q from the post-self-attn state, K/V from the
        # OTHER channel's pre-layer value, deliberately un-normalized
        # (modules.py:266-272)
        z = layer_norm(x12, layer["ln_src_attn"]["w"], layer["ln_src_attn"]["b"])
        ca, _ = attention(
            layer["mha_cross"], z, swap(orig), num_heads,
            impl=attn_impl, dropout_rate=dropout, dropout_key=ks[3],
        )
        ca = _dropout(ca, dropout, ks[4])
        x12 = x12 + _dropout(ca, dropout, ks[5])
        z = layer_norm(x12, layer["ln_ffnetwork"]["w"], layer["ln_ffnetwork"]["b"])
        x12 = x12 + _dropout(_ffn(layer["ffn"], z, dropout, ks[6]), dropout, ks[7])
    x = apply_combinator(params["combinator"], x12[:B], x12[B:])
    return {"x": x, "x1": x12[:B], "x2": x12[B:]}


def init_gpt_stereo(
    key: jax.Array,
    dim: int,
    num_layers: int,
    num_heads: int,
    dff_k: int = 3,
) -> Params:
    ks = jax.random.split(key, num_layers + 3)
    return {
        "layers": [
            init_transformer_layer(
                k, dim, int(dim * dff_k), num_heads, cross_attention=True
            )
            for k in ks[:num_layers]
        ],
        "combinator": {
            "h0_a": _init_linear(ks[-3], dim, dim),
            "h0_b": _init_linear(ks[-2], dim, dim),
            "ln": init_norm(dim),
        },
    }


def apply_combinator(params: Params, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """h = GELU(LN(x1 W_a)) + GELU(LN(x2 W_b)) (modules.py:434-449)."""
    ha = jax.nn.gelu(
        layer_norm(x1 @ params["h0_a"]["w"].T, params["ln"]["w"], params["ln"]["b"]),
        approximate=False,
    )
    hb = jax.nn.gelu(
        layer_norm(x2 @ params["h0_b"]["w"].T, params["ln"]["w"], params["ln"]["b"]),
        approximate=False,
    )
    return ha + hb


def apply_gpt_stereo(
    params: Params,
    x1: jax.Array,
    x2: jax.Array,
    *,
    num_heads: int,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    attention_out: bool = False,
) -> Dict[str, jax.Array]:
    sa_a, sa_b, ca_a, ca_b = [], [], [], []
    n = len(params["layers"])
    keys = jax.random.split(rng, n) if rng is not None else [None] * n
    for layer, k in zip(params["layers"], keys):
        x1, x2, (s1, c1, s2, c2) = apply_stereo_layer(
            layer, x1, x2, num_heads=num_heads, dropout=dropout, rng=k,
            attn_impl=attn_impl, return_weights=attention_out,
        )
        if attention_out:
            sa_a.append(s1)
            ca_a.append(c1)
            sa_b.append(s2)
            ca_b.append(c2)

    x = apply_combinator(params["combinator"], x1, x2)
    ret = {"x": x, "x1": x1, "x2": x2}
    if attention_out:
        ret["self_attn"] = jnp.stack(
            [jnp.stack(sa_a, axis=1), jnp.stack(sa_b, axis=1)], axis=1
        )
        ret["cross_attn"] = jnp.stack(
            [jnp.stack(ca_a, axis=1), jnp.stack(ca_b, axis=1)], axis=1
        )
    return ret
