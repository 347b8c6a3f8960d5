"""Full-stack fused conv kernel (conv0..conv4): parity vs the unfused ops
(interpret mode on CPU). Experimental kernel, opt-in VAP_CONV_IMPL=fused_stack."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.models.encoder import init_encoder
from voiceactivityprojection_tpu.ops.conv_stack_fused import (
    _reference_stack,
    fused_conv_stack,
)

pytestmark = [pytest.mark.encoder, pytest.mark.slow]


@pytest.fixture(scope="module")
def enc():
    return init_encoder(jax.random.key(0), dim=256)


@pytest.mark.parametrize("n", [32000, 20480, 12345])
def test_parity(enc, n):
    """One tile (n4 <= 128 at n=20480? no: n4 = n/160) and multi-tile +
    ragged-tail cases; 32000 -> n4=200 (2 tiles), 12345 ragged."""
    x = jax.random.normal(jax.random.key(1), (2, n)) * 0.1
    want = np.asarray(_reference_stack(enc, x))
    got = np.asarray(fused_conv_stack(enc, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_gradient_fallback(enc):
    x = jax.random.normal(jax.random.key(2), (1, 16000)) * 0.1
    g = jax.grad(lambda x: fused_conv_stack(enc, x).sum())(x)
    g_ref = jax.grad(lambda x: _reference_stack(enc, x).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_conv_stack_dispatch(enc, monkeypatch):
    from voiceactivityprojection_tpu.models.encoder import _conv_stack

    x = (jax.random.normal(jax.random.key(3), (2, 16000)) * 0.1)[..., None]
    monkeypatch.setenv("VAP_CONV_IMPL", "xla")
    want = np.asarray(_conv_stack(enc, x))
    monkeypatch.setenv("VAP_CONV_IMPL", "fused_stack")
    got = np.asarray(_conv_stack(enc, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("t1out", [1024, 2048])
def test_parity_tile_override(enc, monkeypatch, t1out):
    """VAP_CONV_T1OUT is read at trace time; both A/B tile sizes must be
    exact (multi-tile at 1024: n4=200 -> 2 tiles of 128)."""
    monkeypatch.setenv("VAP_CONV_T1OUT", str(t1out))
    x = jax.random.normal(jax.random.key(4), (2, 32000)) * 0.1
    want = np.asarray(_reference_stack(enc, x))
    got = np.asarray(fused_conv_stack(enc, x))
    np.testing.assert_allclose(got, want, atol=1e-4)
