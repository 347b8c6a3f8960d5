"""Encoder parity tests vs torch oracles.

The oracle modules are constructed here from the documented hyperparameters
(SURVEY.md §2.2-2.5) using plain torch.nn — then our JAX implementation is
run with the *same* weights and must match numerically. This establishes
checkpoint-import parity without the (unavailable) pretrained blobs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from voiceactivityprojection_tpu.ops.conv import (
    channel_norm,
    conv1d,
    causal_conv1d,
    layer_norm,
)
from voiceactivityprojection_tpu.ops.gru import gru, gru_step, init_gru
from voiceactivityprojection_tpu.models.encoder import (
    CPC_CONV_SPECS,
    apply_encoder,
    apply_encoder_streaming,
    init_encoder,
    init_encoder_state,
)

pytestmark = pytest.mark.encoder


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    for (k, s, p) in [(10, 5, 3), (8, 4, 2), (4, 2, 1)]:
        m = torch.nn.Conv1d(3, 5, k, stride=s, padding=p)
        x = torch.randn(2, 3, 101)
        want = m(x).detach().numpy()  # (B, C, T)
        got = conv1d(
            t2j(x).transpose(0, 2, 1),
            t2j(m.weight).transpose(2, 1, 0),  # (out,in,k) -> (k,in,out)
            t2j(m.bias),
            stride=s,
            padding=(p, p),
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=2e-5
        )


def test_causal_conv_matches_torch_leftpad():
    torch.manual_seed(1)
    k, s = 5, 2
    m = torch.nn.Conv1d(4, 4, k, stride=s)
    x = torch.randn(2, 4, 50)
    xp = torch.nn.functional.pad(x, (k - 1, 0))  # reference CConv1d left pad
    want = m(xp).detach().numpy()
    got = causal_conv1d(
        t2j(x).transpose(0, 2, 1),
        t2j(m.weight).transpose(2, 1, 0),
        t2j(m.bias),
        stride=s,
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, atol=2e-5)


def test_channel_norm_unbiased_variance():
    torch.manual_seed(2)
    x = torch.randn(2, 6, 11)  # (B, C, T)
    w = torch.randn(1, 6, 1)
    b = torch.randn(1, 6, 1)
    # reference ChannelNorm: mean/var over channel dim, unbiased var
    mean = x.mean(dim=1, keepdim=True)
    var = x.var(dim=1, keepdim=True)
    want = ((x - mean) * torch.rsqrt(var + 1e-5) * w + b).numpy()
    got = channel_norm(t2j(x).transpose(0, 2, 1), t2j(w)[0, :, 0], t2j(b)[0, :, 0])
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, atol=1e-5)


def test_layer_norm_matches_torch():
    torch.manual_seed(3)
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(torch.randn(16))
        ln.bias.copy_(torch.randn(16))
    x = torch.randn(2, 7, 16)
    want = ln(x).detach().numpy()
    got = layer_norm(t2j(x), t2j(ln.weight), t2j(ln.bias))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(4)
    m = torch.nn.GRU(8, 8, batch_first=True)
    x = torch.randn(3, 20, 8)
    want, want_h = m(x)
    params = {
        "w_ih": t2j(m.weight_ih_l0).T,
        "w_hh": t2j(m.weight_hh_l0).T,
        "b_ih": t2j(m.bias_ih_l0),
        "b_hh": t2j(m.bias_hh_l0),
    }
    got, got_h = gru(params, t2j(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_h), want_h[0].detach().numpy(), atol=1e-5
    )


def test_gru_step_consistent_with_scan():
    key = jax.random.key(0)
    params = init_gru(key, 8, 8)
    x = jax.random.normal(jax.random.key(1), (2, 5, 8))
    full, h_last = gru(params, x)
    h = jnp.zeros((2, 8))
    for t in range(5):
        h = gru_step(params, x[:, t], h)
        np.testing.assert_allclose(np.asarray(h), np.asarray(full[:, t]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_last), atol=1e-6)


def build_torch_encoder(dim=16):
    """Reference-shaped encoder oracle from documented hyperparameters."""

    class ChannelNorm(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = torch.nn.Parameter(torch.randn(1, c, 1))
            self.bias = torch.nn.Parameter(torch.randn(1, c, 1))

        def forward(self, x):
            m = x.mean(dim=1, keepdim=True)
            v = x.var(dim=1, keepdim=True)
            return (x - m) * torch.rsqrt(v + 1e-5) * self.weight + self.bias

    class Oracle(torch.nn.Module):
        def __init__(self):
            super().__init__()
            convs = []
            c_in = 1
            for (k, s, p) in CPC_CONV_SPECS:
                convs.append(torch.nn.Conv1d(c_in, dim, k, stride=s, padding=p))
                convs.append(ChannelNorm(dim))
                c_in = dim
            self.convs = torch.nn.ModuleList(convs)
            self.gru = torch.nn.GRU(dim, dim, batch_first=True)
            self.down = torch.nn.Conv1d(dim, dim, 5, stride=2)
            self.ln = torch.nn.LayerNorm(dim)

        def forward(self, w):  # w: (B, n)
            x = w.unsqueeze(1)
            for i in range(0, len(self.convs), 2):
                x = torch.relu(self.convs[i + 1](self.convs[i](x)))
            x = x.transpose(1, 2)  # (B, T, C)
            x, _ = self.gru(x)
            x = x.transpose(1, 2)
            x = self.down(torch.nn.functional.pad(x, (4, 0)))
            x = self.ln(x.transpose(1, 2))
            return torch.nn.functional.gelu(x)

    torch.manual_seed(5)
    return Oracle()


def oracle_params_to_jax(m):
    convs = []
    for i in range(0, len(m.convs), 2):
        conv, norm = m.convs[i], m.convs[i + 1]
        convs.append(
            {
                "conv": {"w": t2j(conv.weight).transpose(2, 1, 0), "b": t2j(conv.bias)},
                "norm": {"w": t2j(norm.weight)[0, :, 0], "b": t2j(norm.bias)[0, :, 0]},
            }
        )
    return {
        "gEncoder": convs,
        "gAR": {
            "w_ih": t2j(m.gru.weight_ih_l0).T,
            "w_hh": t2j(m.gru.weight_hh_l0).T,
            "b_ih": t2j(m.gru.bias_ih_l0),
            "b_hh": t2j(m.gru.bias_hh_l0),
        },
        "downsample": {
            "conv": {"w": t2j(m.down.weight).transpose(2, 1, 0), "b": t2j(m.down.bias)},
            "ln": {"w": t2j(m.ln.weight), "b": t2j(m.ln.bias)},
        },
    }


def test_full_encoder_matches_torch_oracle():
    m = build_torch_encoder(dim=16)
    n = 16000  # 1 s
    x = torch.randn(2, n)
    with torch.no_grad():
        want = m(x).numpy()  # (B, 50, 16)
    params = oracle_params_to_jax(m)
    got = np.asarray(apply_encoder(params, t2j(x)))
    assert got.shape == want.shape == (2, 50, 16)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_encoder_output_rate():
    key = jax.random.key(0)
    params = init_encoder(key, dim=16)
    # (dim=16 keeps CPU test fast; rate logic is dim-independent)
    w = jax.random.normal(jax.random.key(1), (1, 3200))  # 0.2 s
    out = apply_encoder(params, w)
    assert out.shape == (1, 10, 16)  # 0.2 s * 50 Hz


def _run_streaming(params, w, hop):
    state = init_encoder_state(params, batch=w.shape[0])
    chunks = []
    for i in range(0, w.shape[1], hop):
        y, state = apply_encoder_streaming(params, w[:, i : i + hop], state)
        chunks.append(np.asarray(y))
    return np.concatenate(chunks, axis=1)


def test_streaming_chunk_size_invariance():
    """The core streaming invariant: output must be independent of how the
    signal is chopped into chunks (exact, not approximate)."""
    key = jax.random.key(0)
    params = init_encoder(key, dim=16)
    w = jax.random.normal(jax.random.key(1), (1, 16000))
    a = _run_streaming(params, w, hop=3200)
    b = _run_streaming(params, w, hop=320)   # one 50 Hz frame per call
    c = _run_streaming(params, w, hop=16000)  # single chunk
    np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(a, c, atol=1e-5)


def test_streaming_tracks_full_forward():
    """Streaming is strictly causal while the reference conv stack uses
    symmetric padding, so features are offset by a sub-frame lag (~152
    samples cumulative, SURVEY.md §7.3 causal-equivalence note). With
    random white filters that costs correlation; assert loose agreement
    plus matching shapes."""
    key = jax.random.key(0)
    params = init_encoder(key, dim=16)
    w = jax.random.normal(jax.random.key(1), (1, 16000))
    full = np.asarray(apply_encoder(params, w))
    stream = _run_streaming(params, w, hop=3200)
    assert stream.shape == full.shape
    corr = np.corrcoef(stream[0, 5:-5].ravel(), full[0, 5:-5].ravel())[0, 1]
    assert corr > 0.6, f"streaming/full correlation too low: {corr}"
