"""Fused conv0+conv1 kernel: parity vs the generic path (interpret mode).

Status note: on v5e the kernel compiles and bit-matches but measures ~7%
SLOWER than XLA's fused unfused path at the bench batch (73.7 vs 68.8 ms
for 128 rows x 320k samples bf16) — the packed block-diagonal layout costs
12.8x extra conv0 FLOPs and the per-tile DMA is not double-buffered. It is
therefore NOT wired into the encoder; kept as a documented experiment and
a correctness-tested base for future double-buffered iterations.
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
