"""Flash-ALiBi kernel parity vs the dense reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.flash_alibi import (
    _dense_reference,
    flash_alibi_attention,
)
from voiceactivityprojection_tpu.ops.attention import alibi_slopes

pytestmark = [pytest.mark.transformer, pytest.mark.slow]


@pytest.mark.parametrize("T", [128, 256, 200])  # 200 exercises padding
def test_flash_matches_dense(T):
    B, H, Dh = 1, 2, 16
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, Dh))
    k = jax.random.normal(ks[1], (B, H, T, Dh))
    v = jax.random.normal(ks[2], (B, H, T, Dh))
    slopes = alibi_slopes(H)
    scale = 0.125

    want = np.asarray(_dense_reference(q, k, v, slopes, scale))
    got = np.asarray(flash_alibi_attention(q, k, v, slopes, scale))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_gradients_match_dense():
    B, H, T, Dh = 1, 2, 128, 8
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, H, T, Dh))
    k = jax.random.normal(ks[1], (B, H, T, Dh))
    v = jax.random.normal(ks[2], (B, H, T, Dh))
    slopes = alibi_slopes(H)

    def f_flash(q, k, v):
        return (flash_alibi_attention(q, k, v, slopes, 0.2) ** 2).sum()

    def f_dense(q, k, v):
        return (_dense_reference(q, k, v, slopes, 0.2) ** 2).sum()

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("impl", ["v1", "v2", "v3", "v5", "tri"])
@pytest.mark.parametrize("T,cs", [(128, 128), (200, 256), (300, 128)])
def test_single_block_impls_match_dense(monkeypatch, impl, T, cs):
    """All exact single-block kernels (full-plane v1/v2/v3, max-free
    bounded-softmax v5, triangle-chunked tri) must agree with dense,
    including T not a multiple of the chunk size. (v4 — bf16 planes — is
    a measured-and-rejected variant tested separately with its inherent
    rounding tolerance.)"""
    from voiceactivityprojection_tpu.ops.flash_alibi import _single_block_forward

    monkeypatch.setenv("VAP_FLASH_SINGLE_IMPL", impl)
    monkeypatch.setenv("VAP_FLASH_CS", str(cs))
    B, H, Dh = 1, 4, 16
    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (B, H, T, Dh))
    k = jax.random.normal(ks[1], (B, H, T, Dh))
    v = jax.random.normal(ks[2], (B, H, T, Dh))
    slopes = alibi_slopes(H)
    scale = 0.125

    want = np.asarray(_dense_reference(q, k, v, slopes, scale))
    got = np.asarray(_single_block_forward(q, k, v, slopes, scale))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_single_block_v4_rough_agreement(monkeypatch):
    """v4 keeps the score planes in bf16 (measured-and-rejected for
    accuracy at T=1000 — see its docstring); regression-test that it
    still runs and lands within its inherent bf16 rounding at small T."""
    from voiceactivityprojection_tpu.ops.flash_alibi import _single_block_forward

    monkeypatch.setenv("VAP_FLASH_SINGLE_IMPL", "v4")
    B, H, T, Dh = 1, 4, 128, 16
    ks = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(ks[0], (B, H, T, Dh))
    k = jax.random.normal(ks[1], (B, H, T, Dh))
    v = jax.random.normal(ks[2], (B, H, T, Dh))
    slopes = alibi_slopes(H)
    want = np.asarray(_dense_reference(q, k, v, slopes, 0.125))
    got = np.asarray(_single_block_forward(q, k, v, slopes, 0.125))
    np.testing.assert_allclose(got, want, atol=0.15)
    assert np.abs(got - want).mean() < 0.02  # rough agreement, not noise


@pytest.mark.parametrize(
    "T,bq,bk",
    [
        (1000, 256, 512),  # DEFAULT blocks at model length: nq != nk
        (1024, 512, 1024),
        (1024, 128, 512),
        (768, 256, 128),   # block_q > block_k
        (1000, 512, 512),
    ],
)
def test_flash_unequal_blocks(T, bq, bk):
    """Regression: the causal-skip/finalize conditions must compare row
    ranges, not block indices — with block_q != block_k the old `ik == iq`
    finalize never wrote q-blocks past nk, silently zeroing outputs."""
    from voiceactivityprojection_tpu.ops.flash_alibi import _flash_forward

    B, H, Dh = 1, 2, 16
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (B, H, T, Dh))
    k = jax.random.normal(ks[1], (B, H, T, Dh))
    v = jax.random.normal(ks[2], (B, H, T, Dh))
    slopes = alibi_slopes(H)
    scale = 0.125

    want = np.asarray(_dense_reference(q, k, v, slopes, scale))
    got = np.asarray(_flash_forward(q, k, v, slopes, scale, block_q=bq, block_k=bk))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-5)
