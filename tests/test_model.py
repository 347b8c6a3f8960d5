"""Full-model tests: assembly shapes, probs/vad surfaces, and end-to-end
numeric parity against a torch oracle whose state dict uses the reference's
exact key names (exercising the checkpoint importer on the real mapping).
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn

from voiceactivityprojection_tpu.config import VapConfig, VapMonoConfig
from voiceactivityprojection_tpu.models.vap import (
    VapModel,
    VapMonoModel,
    forward,
    init_vap,
    init_vap_mono,
    forward_mono,
)
from voiceactivityprojection_tpu.models.checkpoint import (
    import_vap_state_dict,
    remap_legacy_state_dict,
)
from voiceactivityprojection_tpu.models.encoder import CPC_CONV_SPECS

pytestmark = pytest.mark.model

DIM, HEADS, CH_LAYERS, CROSS_LAYERS = 16, 4, 1, 2
CONF = VapConfig(
    dim=DIM, encoder_dim=DIM, channel_layers=CH_LAYERS,
    cross_layers=CROSS_LAYERS, num_heads=HEADS,
)


# ----------------------------------------------------------------------
# torch oracle with reference state-dict layout
# ----------------------------------------------------------------------
def slopes(n):
    start = 2 ** (-(2 ** -(math.log2(n) - 3)))
    return [start * start ** i for i in range(n)]


class ChannelNorm(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(1, c, 1))
        self.bias = nn.Parameter(torch.randn(1, c, 1))

    def forward(self, x):
        m = x.mean(dim=1, keepdim=True)
        v = x.var(dim=1, keepdim=True)
        return (x - m) * torch.rsqrt(v + 1e-5) * self.weight + self.bias


class GEncoder(nn.Module):
    def __init__(self, dim):
        super().__init__()
        c_in = 1
        for i, (k, s, p) in enumerate(CPC_CONV_SPECS):
            setattr(self, f"conv{i}", nn.Conv1d(c_in, dim, k, stride=s, padding=p))
            setattr(self, f"batchNorm{i}", ChannelNorm(dim))
            c_in = dim

    def forward(self, x):
        for i in range(len(CPC_CONV_SPECS)):
            x = torch.relu(getattr(self, f"batchNorm{i}")(getattr(self, f"conv{i}")(x)))
        return x


class GAR(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.baseNet = nn.GRU(dim, dim, batch_first=True)

    def forward(self, x):
        return self.baseNet(x)[0]


class CPC(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gEncoder = GEncoder(dim)
        self.gAR = GAR(dim)


class LNWrap(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.ln = nn.LayerNorm(dim)

    def forward(self, x):  # (B, C, T)
        return self.ln(x.transpose(1, 2)).transpose(1, 2)


class Encoder(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.encoder = CPC(dim)
        self.downsample = nn.Sequential(
            nn.Identity(), nn.Conv1d(dim, dim, 5, stride=2), LNWrap(dim), nn.GELU()
        )

    def forward(self, w):  # (B, n)
        z = self.encoder.gEncoder(w.unsqueeze(1))
        z = self.encoder.gAR(z.transpose(1, 2)).transpose(1, 2)
        z = nn.functional.pad(z, (4, 0))
        return self.downsample(z).transpose(1, 2)  # (B, T, C)


class MHA(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.dim, self.num_heads = dim, heads
        self.key = nn.Linear(dim, dim, bias=False)
        self.query = nn.Linear(dim, dim, bias=False)
        self.value = nn.Linear(dim, dim, bias=False)
        self.proj = nn.Linear(dim, dim, bias=False)
        self.m = nn.Parameter(torch.tensor(slopes(heads)), requires_grad=False)

    def forward(self, Q, K, V):
        B, T, D = Q.shape
        hd = D // self.num_heads

        def split(x):
            return x.view(B, -1, self.num_heads, hd).transpose(1, 2)

        q, k, v = split(self.query(Q)), split(self.key(K)), split(self.value(V))
        att = torch.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(D)
        j = torch.arange(K.shape[1], dtype=torch.float32)
        att = att + (self.m[:, None] * j[None, :])[None, :, None, :]
        causal = torch.tril(torch.ones(T, K.shape[1])).bool()
        att = att.masked_fill(~causal, float("-inf")).softmax(-1)
        out = torch.einsum("bhij,bhjd->bhid", att, v)
        return self.proj(out.transpose(1, 2).reshape(B, T, D))


class Layer(nn.Module):
    def __init__(self, dim, heads, cross=False):
        super().__init__()
        self.ln_self_attn = nn.LayerNorm(dim)
        self.ln_ffnetwork = nn.LayerNorm(dim)
        self.mha = MHA(dim, heads)
        self.ffnetwork = nn.Sequential(
            nn.Linear(dim, 3 * dim, bias=False), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(3 * dim, dim, bias=False),
        )
        if cross:
            self.ln_src_attn = nn.LayerNorm(dim)
            self.mha_cross = MHA(dim, heads)

    def forward(self, x, src=None):
        z = self.ln_self_attn(x)
        x = x + self.mha(z, z, z)
        if src is not None:
            z = self.ln_src_attn(x)
            x = x + self.mha_cross(z, src, src)
        return x + self.ffnetwork(self.ln_ffnetwork(x))


class GPT(nn.Module):
    def __init__(self, dim, heads, n):
        super().__init__()
        self.layers = nn.ModuleList([Layer(dim, heads) for _ in range(n)])

    def forward(self, x):
        for l in self.layers:
            x = l(x)
        return x


class Combinator(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.h0_a = nn.Linear(dim, dim, bias=False)
        self.h0_b = nn.Linear(dim, dim, bias=False)
        self.ln = nn.LayerNorm(dim)

    def forward(self, x1, x2):
        return nn.functional.gelu(self.ln(self.h0_a(x1))) + nn.functional.gelu(
            self.ln(self.h0_b(x2))
        )


class GPTStereo(nn.Module):
    def __init__(self, dim, heads, n):
        super().__init__()
        self.layers = nn.ModuleList([Layer(dim, heads, cross=True) for _ in range(n)])
        self.combinator = Combinator(dim)

    def forward(self, x1, x2):
        for l in self.layers:
            x1, x2 = l(x1, src=x2), l(x2, src=x1)
        return self.combinator(x1, x2), x1, x2


class OracleVap(nn.Module):
    def __init__(self, dim=DIM, heads=HEADS):
        super().__init__()
        self.encoder = Encoder(dim)
        self.ar_channel = GPT(dim, heads, CH_LAYERS)
        self.ar = GPTStereo(dim, heads, CROSS_LAYERS)
        self.va_classifier = nn.Linear(dim, 1)
        self.vap_head = nn.Linear(dim, 256)

    def forward(self, waveform):  # (B, 2, n)
        x1 = self.encoder(waveform[:, 0])
        x2 = self.encoder(waveform[:, 1])
        o1 = self.ar_channel(x1)
        o2 = self.ar_channel(x2)
        x, z1, z2 = self.ar(o1, o2)
        vad = torch.cat([self.va_classifier(z1), self.va_classifier(z2)], dim=-1)
        return {"logits": self.vap_head(x), "vad": vad}


def test_import_and_forward_matches_torch_oracle():
    """The core round-1 parity milestone: reference-format state dict ->
    importer -> JAX forward == torch forward (SURVEY.md §7.5)."""
    torch.manual_seed(0)
    oracle = OracleVap().eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = import_vap_state_dict(sd, CONF)

    w = torch.randn(2, 2, 8000)  # 0.5 s stereo
    with torch.no_grad():
        want = oracle(w)
    got = forward(params, jnp.asarray(w.numpy()), CONF)
    assert got["logits"].shape == tuple(want["logits"].shape) == (2, 25, 256)
    assert got["vad"].shape == tuple(want["vad"].shape) == (2, 25, 2)
    np.testing.assert_allclose(
        np.asarray(got["logits"]), want["logits"].numpy(), atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(got["vad"]), want["vad"].numpy(), atol=2e-3)


def test_stereo_simultaneous_update():
    """The reference stereo layer computes z1 and z2 both from the ORIGINAL
    (x1, x2) — not sequentially (vap/modules.py:278-289). Verify ours does
    the same: z2 must equal a manual pass with the un-updated x1 as src."""
    from voiceactivityprojection_tpu.models.transformer import (
        apply_stereo_layer,
        apply_transformer_layer,
        init_transformer_layer,
    )

    p = init_transformer_layer(jax.random.key(0), DIM, 3 * DIM, HEADS, cross_attention=True)
    x1 = jax.random.normal(jax.random.key(1), (1, 5, DIM))
    x2 = jax.random.normal(jax.random.key(2), (1, 5, DIM))
    z1, z2, _ = apply_stereo_layer(p, x1, x2, num_heads=HEADS)
    z2_manual, _, _ = apply_transformer_layer(p, x2, src=x1, num_heads=HEADS)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z2_manual), atol=1e-6)


def test_vap_model_surfaces():
    model = VapModel.init(jax.random.key(0), CONF)
    w = jax.random.normal(jax.random.key(1), (1, 2, 8000))
    out = model.forward(w)
    assert out["logits"].shape == (1, 25, 256)
    probs = model.probs(w)
    assert set(probs) == {"probs", "vad", "p_now", "p_future", "H"}
    assert probs["p_now"].shape == (1, 25, 2)
    s = np.asarray(probs["p_now"]).sum(-1)
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-3)
    H = np.asarray(probs["H"])
    assert (H >= 0).all() and (H <= 8.0 + 1e-5).all()

    v = np.asarray(model.vad(w))
    assert v.shape == (1, 25, 2)
    assert set(np.unique(v)).issubset({0.0, 1.0})


def test_probs_with_vad_loss():
    model = VapModel.init(jax.random.key(0), CONF)
    w = jax.random.normal(jax.random.key(1), (1, 2, 32000))  # 2 s -> 100 frames
    vad = (jax.random.uniform(jax.random.key(2), (1, 200, 2)) < 0.5).astype(jnp.float32)
    probs = model.probs(w, vad=vad)
    assert "loss" in probs
    assert probs["loss"].shape == (1, 100)  # n_frames - horizon labels


def test_forward_with_attention_maps():
    model = VapModel.init(jax.random.key(0), CONF)
    w = jax.random.normal(jax.random.key(1), (1, 2, 8000))
    out = model.forward(w, attention=True)
    assert out["self_attn"].shape == (1, 2, CH_LAYERS, HEADS, 25, 25)
    assert out["cross_attn"].shape == (1, 2, CROSS_LAYERS, HEADS, 25, 25)


def test_mono_model():
    conf = VapMonoConfig(
        dim=DIM, encoder_dim=DIM, channel_layers=CH_LAYERS,
        cross_layers=CROSS_LAYERS, num_heads=HEADS,
    )
    model = VapMonoModel.init(jax.random.key(0), conf)
    w = jax.random.normal(jax.random.key(1), (1, 1, 8000))
    va = (jax.random.uniform(jax.random.key(2), (1, 25, 2)) < 0.5).astype(jnp.float32)
    out = model.forward(w, va)
    assert out["logits"].shape == (1, 25, 256)
    probs = model.probs(w, va)
    assert probs["p_now"].shape == (1, 25, 2)


def test_mono_with_history():
    conf = VapMonoConfig(
        dim=DIM, encoder_dim=DIM, channel_layers=CH_LAYERS,
        cross_layers=CROSS_LAYERS, num_heads=HEADS, va_history=True,
    )
    params = init_vap_mono(jax.random.key(0), conf)
    w = jax.random.normal(jax.random.key(1), (1, 8000))
    va = (jax.random.uniform(jax.random.key(2), (1, 25, 2)) < 0.5).astype(jnp.float32)
    vah = jax.random.uniform(jax.random.key(3), (1, 25, 5))
    out = forward_mono(params, w, va, conf, va_history=vah)
    assert out["logits"].shape == (1, 25, 256)


def test_legacy_state_dict_remap():
    sd = {
        "net.vap_head.projection_head.weight": 1,
        "net.encoder.encoder.gAR.baseNet.weight_ih_l0": 2,
        "net.VAP.codebook.emb.weight": 3,
    }
    out = remap_legacy_state_dict(sd)
    assert out == {
        "vap_head.weight": 1,
        "encoder.encoder.gAR.baseNet.weight_ih_l0": 2,
    }


def test_gradients_flow_to_all_params():
    """Every trainable param must receive gradient from the multitask loss
    (intent of reference tests/test_model.py forward->backward assertions)."""
    from voiceactivityprojection_tpu.ops.losses import loss_vap, loss_vad
    from voiceactivityprojection_tpu.ops.codebook import get_labels

    model = VapModel.init(jax.random.key(0), CONF)
    w = jax.random.normal(jax.random.key(1), (1, 2, 32000))
    vad = (jax.random.uniform(jax.random.key(2), (1, 200, 2)) < 0.5).astype(jnp.float32)
    labels = get_labels(vad, CONF.bin_frames)

    def loss_fn(params):
        out = forward(params, w, CONF)
        return loss_vap(out["logits"], labels) + loss_vad(out["vad"], vad[:, :100])

    grads = jax.grad(loss_fn)(model.params)
    flat = jax.tree.leaves(
        {k: v for k, v in grads.items() if k != "encoder"}
    )
    for g in flat:
        assert float(jnp.abs(g).sum()) > 0 or g.size <= 4  # tiny biases can be 0
