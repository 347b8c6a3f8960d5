"""Transformer parity + behavior tests.

The torch oracle replicates the documented reference architecture
(SURVEY.md §2.6-2.8): explicit QKV attention with FULL-dim 1/sqrt(dim)
scaling, ALiBi bias ``m_h * j`` + causal -inf, pre-LN block with
un-normalized cross-attention source, bias-free FFN with GELU, shared
stereo weights, Combinator fusion. Gradient-flow tests mirror the intent
of reference tests/test_transformer.py:34-66.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from voiceactivityprojection_tpu.ops.attention import (
    alibi_slopes,
    attention_dense,
    init_mha,
)
from voiceactivityprojection_tpu.models.transformer import (
    apply_combinator,
    apply_gpt,
    apply_gpt_stereo,
    apply_transformer_layer,
    apply_stereo_layer,
    init_gpt,
    init_gpt_stereo,
    init_transformer_layer,
)

pytestmark = pytest.mark.transformer


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def torch_alibi_slopes(n):
    def p2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start ** i for i in range(n)]

    if math.log2(n).is_integer():
        return p2(n)
    closest = 2 ** math.floor(math.log2(n))
    return p2(closest) + torch_alibi_slopes(2 * closest)[0::2][: n - closest]


@pytest.mark.parametrize("h", [1, 2, 4, 8, 3, 6])
def test_alibi_slopes(h):
    got = np.asarray(alibi_slopes(h))
    want = np.asarray(torch_alibi_slopes(h))
    np.testing.assert_allclose(got, want, rtol=1e-6)


class TorchAlibiMHA(torch.nn.Module):
    """Oracle: reference-semantics ALiBi attention (bias m_h*j + causal)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.dim, self.heads = dim, heads
        self.q = torch.nn.Linear(dim, dim, bias=False)
        self.k = torch.nn.Linear(dim, dim, bias=False)
        self.v = torch.nn.Linear(dim, dim, bias=False)
        self.proj = torch.nn.Linear(dim, dim, bias=False)
        self.m = torch.tensor(torch_alibi_slopes(heads))

    def forward(self, Q, K, V):
        B, T, D = Q.shape
        S = K.shape[1]
        hd = D // self.heads

        def split(x):
            return x.view(B, -1, self.heads, hd).transpose(1, 2)

        q, k, v = split(self.q(Q)), split(self.k(K)), split(self.v(V))
        att = torch.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(D)  # FULL dim
        j = torch.arange(S, dtype=torch.float32)
        bias = self.m[:, None] * j[None, :]  # (H, S): reference m*j form
        att = att + bias[None, :, None, :]
        causal = torch.tril(torch.ones(T, S)).bool()
        att = att.masked_fill(~causal, float("-inf"))
        w = att.softmax(-1)
        out = torch.einsum("bhij,bhjd->bhid", w, v)
        out = out.transpose(1, 2).reshape(B, T, D)
        return self.proj(out), w


def mha_params_from_torch(m):
    return {
        "query": {"w": t2j(m.q.weight)},
        "key": {"w": t2j(m.k.weight)},
        "value": {"w": t2j(m.v.weight)},
        "proj": {"w": t2j(m.proj.weight)},
        "m": t2j(m.m),
    }


def test_attention_matches_reference_semantics():
    torch.manual_seed(0)
    m = TorchAlibiMHA(16, 4)
    x = torch.randn(2, 12, 16)
    with torch.no_grad():
        want, want_w = m(x, x, x)
    params = mha_params_from_torch(m)
    got, got_w = attention_dense(params, t2j(x), t2j(x), 4, return_weights=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(), atol=1e-5)


def test_attention_is_causal():
    params = init_mha(jax.random.key(0), 16, 4)
    x = jax.random.normal(jax.random.key(1), (1, 10, 16))
    out1, _ = attention_dense(params, x, x, 4)
    # perturb the future: outputs at earlier positions must not change
    x2 = x.at[:, 7:].set(0.0)
    out2, _ = attention_dense(params, x2, x2, 4)
    np.testing.assert_allclose(
        np.asarray(out1[:, :7]), np.asarray(out2[:, :7]), atol=1e-6
    )


class TorchLayer(torch.nn.Module):
    """Oracle transformer layer (pre-LN, optional cross-attn, un-normalized src)."""

    def __init__(self, dim, heads, cross=False):
        super().__init__()
        self.ln1 = torch.nn.LayerNorm(dim)
        self.ln2 = torch.nn.LayerNorm(dim)
        self.mha = TorchAlibiMHA(dim, heads)
        self.ffn_in = torch.nn.Linear(dim, 3 * dim, bias=False)
        self.ffn_out = torch.nn.Linear(3 * dim, dim, bias=False)
        self.cross = cross
        if cross:
            self.ln_src = torch.nn.LayerNorm(dim)
            self.mha_cross = TorchAlibiMHA(dim, heads)

    def forward(self, x, src=None):
        z = self.ln1(x)
        sa, _ = self.mha(z, z, z)
        x = x + sa
        if self.cross and src is not None:
            z = self.ln_src(x)
            ca, _ = self.mha_cross(z, src, src)  # src NOT normalized
            x = x + ca
        x = x + self.ffn_out(torch.nn.functional.gelu(self.ffn_in(self.ln2(x))))
        return x


def layer_params_from_torch(m):
    p = {
        "ln_self_attn": {"w": t2j(m.ln1.weight), "b": t2j(m.ln1.bias)},
        "ln_ffnetwork": {"w": t2j(m.ln2.weight), "b": t2j(m.ln2.bias)},
        "mha": mha_params_from_torch(m.mha),
        "ffn": {
            "w_in": {"w": t2j(m.ffn_in.weight)},
            "w_out": {"w": t2j(m.ffn_out.weight)},
        },
    }
    if m.cross:
        p["ln_src_attn"] = {"w": t2j(m.ln_src.weight), "b": t2j(m.ln_src.bias)}
        p["mha_cross"] = mha_params_from_torch(m.mha_cross)
    return p


def test_layer_matches_oracle():
    torch.manual_seed(1)
    m = TorchLayer(16, 4)
    x = torch.randn(2, 9, 16)
    with torch.no_grad():
        want = m(x).numpy()
    got, _, _ = apply_transformer_layer(
        layer_params_from_torch(m), t2j(x), num_heads=4
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_cross_layer_matches_oracle():
    torch.manual_seed(2)
    m = TorchLayer(16, 4, cross=True)
    x = torch.randn(2, 9, 16)
    s = torch.randn(2, 9, 16)
    with torch.no_grad():
        want = m(x, s).numpy()
    got, _, _ = apply_transformer_layer(
        layer_params_from_torch(m), t2j(x), src=t2j(s), num_heads=4
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gpt_shapes_and_attn():
    params = init_gpt(jax.random.key(0), dim=16, num_layers=2, num_heads=4)
    x = jax.random.normal(jax.random.key(1), (2, 11, 16))
    out = apply_gpt(params, x, num_heads=4, attention_out=True)
    assert out["x"].shape == (2, 11, 16)
    assert out["attn"].shape == (2, 2, 4, 11, 11)
    rows = np.asarray(out["attn"]).sum(-1)
    np.testing.assert_allclose(rows, np.ones_like(rows), atol=1e-5)


def test_gpt_stereo_shapes():
    params = init_gpt_stereo(jax.random.key(0), dim=16, num_layers=3, num_heads=4)
    x1 = jax.random.normal(jax.random.key(1), (2, 11, 16))
    x2 = jax.random.normal(jax.random.key(2), (2, 11, 16))
    out = apply_gpt_stereo(params, x1, x2, num_heads=4, attention_out=True)
    assert out["x"].shape == (2, 11, 16)
    assert out["x1"].shape == out["x2"].shape == (2, 11, 16)
    assert out["self_attn"].shape == (2, 2, 3, 4, 11, 11)
    assert out["cross_attn"].shape == (2, 2, 3, 4, 11, 11)


def test_stereo_symmetry():
    """Stereo towers share weights: swapping inputs swaps outputs."""
    params = init_gpt_stereo(jax.random.key(0), dim=16, num_layers=2, num_heads=4)
    x1 = jax.random.normal(jax.random.key(1), (1, 7, 16))
    x2 = jax.random.normal(jax.random.key(2), (1, 7, 16))
    a = apply_gpt_stereo(params, x1, x2, num_heads=4)
    b = apply_gpt_stereo(params, x2, x1, num_heads=4)
    np.testing.assert_allclose(np.asarray(a["x1"]), np.asarray(b["x2"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a["x2"]), np.asarray(b["x1"]), atol=1e-6)


def test_cross_attention_gradient_flow():
    """Gradients must flow from tower-1 output back into tower-2 input
    through cross-attention (intent of reference test_transformer.py:34-66)."""
    params = init_gpt_stereo(jax.random.key(0), dim=16, num_layers=1, num_heads=4)
    x1 = jax.random.normal(jax.random.key(1), (1, 7, 16))
    x2 = jax.random.normal(jax.random.key(2), (1, 7, 16))

    def loss(x2_):
        out = apply_gpt_stereo(params, x1, x2_, num_heads=4)
        return (out["x1"] ** 2).sum()

    g = jax.grad(loss)(x2)
    assert float(jnp.abs(g).sum()) > 0.0


def test_dropout_only_with_rng():
    params = init_gpt(jax.random.key(0), dim=16, num_layers=1, num_heads=4)
    x = jax.random.normal(jax.random.key(1), (1, 7, 16))
    a = apply_gpt(params, x, num_heads=4, dropout=0.5)["x"]  # no rng -> off
    b = apply_gpt(params, x, num_heads=4, dropout=0.5)["x"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    c = apply_gpt(params, x, num_heads=4, dropout=0.5, rng=jax.random.key(3))["x"]
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_stereo_batched_matches_twin_pass():
    """apply_gpt_stereo_batched == apply_gpt_stereo on the split halves
    (same weights; cross K/V half-swap reproduces the twin pass exactly)."""
    from voiceactivityprojection_tpu.models.transformer import (
        apply_gpt_stereo_batched,
    )

    key = jax.random.key(11)
    B, T, D, H = 3, 17, 32, 4
    params = init_gpt_stereo(key, D, num_layers=3, num_heads=H)
    x1 = jax.random.normal(jax.random.key(1), (B, T, D))
    x2 = jax.random.normal(jax.random.key(2), (B, T, D))

    ref = apply_gpt_stereo(params, x1, x2, num_heads=H)
    got = apply_gpt_stereo_batched(
        params, jnp.concatenate([x1, x2], axis=0), num_heads=H
    )
    for k in ("x", "x1", "x2"):
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-5)
