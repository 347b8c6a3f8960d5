"""Fused conv0+conv1 kernel: parity vs the generic path (interpret mode).

Status note: with double-buffered tile DMA the kernel beats XLA's unfused
path in ISOLATION on v5e (46.7 vs 49.4 ms for 128 rows x 320k samples
bf16) but measures ~2% slower inside the full jitted forward (XLA overlaps
the unfused convs with surrounding work). It is reachable via
VAP_CONV_IMPL=fused in `models/encoder._conv_stack`; the default is XLA.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.models.encoder import init_encoder
from voiceactivityprojection_tpu.ops.conv_fused import (
    _reference_unfused,
    fused_conv01,
    fused_conv01_supported,
)

pytestmark = [pytest.mark.encoder, pytest.mark.slow]


@pytest.fixture(scope="module")
def enc():
    return init_encoder(jax.random.key(0), dim=256)


def test_supported_shapes(enc):
    assert fused_conv01_supported(enc)
    small = init_encoder(jax.random.key(0), dim=16)
    assert not fused_conv01_supported(small)


@pytest.mark.parametrize("n", [16000, 20480, 12345])
def test_parity(enc, n):
    x = jax.random.normal(jax.random.key(1), (2, n)) * 0.1
    want = np.asarray(_reference_unfused(enc, x))
    got = np.asarray(fused_conv01(enc, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gradient_fallback(enc):
    x = jax.random.normal(jax.random.key(2), (1, 16000)) * 0.1
    g = jax.grad(lambda x: fused_conv01(enc, x).sum())(x)
    g_ref = jax.grad(lambda x: _reference_unfused(enc, x).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_conv_stack_dispatch_parity(enc, monkeypatch):
    """encoder._conv_stack with VAP_CONV_IMPL=fused equals the XLA path."""
    from voiceactivityprojection_tpu.models.encoder import _conv_stack

    x = (jax.random.normal(jax.random.key(2), (2, 16000)) * 0.1)[..., None]
    monkeypatch.setenv("VAP_CONV_IMPL", "xla")
    want = np.asarray(_conv_stack(enc, x))
    monkeypatch.setenv("VAP_CONV_IMPL", "fused")
    got = np.asarray(_conv_stack(enc, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_stack_dispatch_grad(enc, monkeypatch):
    """Fused path is differentiable (VJP falls back to the unfused ops)."""
    from voiceactivityprojection_tpu.models.encoder import _conv_stack

    x = (jax.random.normal(jax.random.key(3), (1, 8000)) * 0.1)[..., None]

    def loss(p, impl):
        monkeypatch.setenv("VAP_CONV_IMPL", impl)
        return (_conv_stack(p, x) ** 2).sum()

    g_x = jax.grad(loss)(enc, "xla")
    g_f = jax.grad(loss)(enc, "fused")
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-4)
