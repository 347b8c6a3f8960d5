"""Training flash attention (ALiBi + causal + in-kernel dropout, flash
backward): parity vs a dense reference that applies the SAME hash-derived
dropout mask (`dropout_mask_reference` is the oracle the kernels must
reproduce). Interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.attention import alibi_slopes
from voiceactivityprojection_tpu.ops.flash_alibi_train import (
    _flash_train_forward,
    dropout_mask_reference,
    flash_alibi_attention_train,
)

pytestmark = [pytest.mark.transformer]

B, H, T, DH = 1, 2, 160, 32
SCALE = 1.0 / np.sqrt(H * DH)


@pytest.fixture(scope="module")
def qkv():
    ks = jax.random.split(jax.random.key(0), 3)
    mk = lambda k: jax.random.normal(k, (B, H, T, DH), jnp.float32) * 0.3
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def dense_ref(q, k, v, slopes, scale, mask=None, rate=0.0):
    Tq = q.shape[2]
    s = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    i = jnp.arange(Tq)[:, None]
    j = jnp.arange(Tq)[None, :]
    s = s + slopes[None, :, None, None] * (j - i)
    s = jnp.where(j <= i, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        w = jnp.where(mask, w / (1.0 - rate), 0.0)
    return jnp.einsum("bhij,bhjd->bhid", w, v)


def oracle_mask(seed, rate):
    m = jnp.stack(
        [dropout_mask_reference(seed, bh, T, rate) for bh in range(B * H)]
    )
    return m.reshape(B, H, T, T)


def test_forward_no_dropout(qkv):
    q, k, v = qkv
    slopes = alibi_slopes(H)
    seed = jnp.zeros((), jnp.int32)
    got = flash_alibi_attention_train(q, k, v, slopes, seed, SCALE, 0.0)
    want = dense_ref(q, k, v, slopes, SCALE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_backward_no_dropout(qkv):
    q, k, v = qkv
    slopes = alibi_slopes(H)
    seed = jnp.zeros((), jnp.int32)
    cot = jax.random.normal(jax.random.key(9), (B, H, T, DH))

    def f_flash(q, k, v):
        return jnp.sum(
            flash_alibi_attention_train(q, k, v, slopes, seed, SCALE, 0.0) * cot
        )

    def f_dense(q, k, v):
        return jnp.sum(dense_ref(q, k, v, slopes, SCALE) * cot)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_forward_dropout_matches_masked_dense(qkv, rate):
    q, k, v = qkv
    slopes = alibi_slopes(H)
    seed = jnp.asarray(1234, jnp.int32)
    got = flash_alibi_attention_train(q, k, v, slopes, seed, SCALE, rate)
    want = dense_ref(
        q, k, v, slopes, SCALE, mask=oracle_mask(seed, rate), rate=rate
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_backward_dropout_matches_masked_dense(qkv):
    q, k, v = qkv
    rate = 0.1
    slopes = alibi_slopes(H)
    seed = jnp.asarray(77, jnp.int32)
    mask = oracle_mask(seed, rate)
    cot = jax.random.normal(jax.random.key(9), (B, H, T, DH))

    def f_flash(q, k, v):
        return jnp.sum(
            flash_alibi_attention_train(q, k, v, slopes, seed, SCALE, rate) * cot
        )

    def f_dense(q, k, v):
        return jnp.sum(dense_ref(q, k, v, slopes, SCALE, mask, rate) * cot)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_mask_independent_of_blocking(qkv):
    """The coordinate hash must regenerate the same mask under any block
    shape (the backward may be blocked differently from the forward)."""
    q, k, v = qkv
    slopes = alibi_slopes(H)
    seed = jnp.asarray(5, jnp.int32)
    a, _ = _flash_train_forward(
        q, k, v, slopes, seed, SCALE, 0.3, block_q=256, block_k=256
    )
    b, _ = _flash_train_forward(
        q, k, v, slopes, seed, SCALE, 0.3, block_q=256, block_k=128
    )
    c, _ = _flash_train_forward(
        q, k, v, slopes, seed, SCALE, 0.3, block_q=128, block_k=256
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5)


def test_seed_changes_mask(qkv):
    q, k, v = qkv
    slopes = alibi_slopes(H)
    f = lambda s: flash_alibi_attention_train(
        q, k, v, slopes, jnp.asarray(s, jnp.int32), SCALE, 0.2
    )
    a, a2, b = f(1), f(1), f(2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_keep_rate_statistics():
    rate = 0.25
    m = np.asarray(oracle_mask(jnp.asarray(3, jnp.int32), rate))
    assert abs(m.mean() - (1 - rate)) < 0.01


def test_block_clamp_mid_range_lengths():
    """Regression (round-2 review): with dtype-aware backward blocks
    (1024/512 at f32), lengths whose 128-padded size is NOT a power of
    two (e.g. T=750 -> 768) must still satisfy the grid divisibility —
    _clamp_blocks keeps block_k a divisor of block_q."""
    import math as _math

    from voiceactivityprojection_tpu.ops.flash_alibi_train import (
        _clamp_blocks,
        flash_alibi_attention_train,
    )

    for T in (130, 513, 640, 750, 896, 1000, 1024):
        for bq, bk in ((1024, 1024), (1024, 512)):
            cq, ck = _clamp_blocks(T, bq, bk)
            assert cq % ck == 0, (T, bq, bk, cq, ck)
            tp = T + ((-T) % cq)
            assert tp % cq == 0 and tp % ck == 0

    # end to end: f32 with dropout (train path) at the T=750 shape that
    # crashed the assert before the fix
    rng = np.random.default_rng(0)
    B, H, T, Dh = 1, 2, 750, 32
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, T, Dh)).astype(np.float32))
        for _ in range(3)
    )
    slopes = jnp.asarray([0.25, 0.0625], jnp.float32)
    seed = jnp.int32(7)

    def loss(q):
        return flash_alibi_attention_train(
            q, k, v, slopes, seed, 1.0 / 8.0, 0.1
        ).sum()

    val, grad = jax.value_and_grad(loss)(q)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_fused_and_split_backward_agree(qkv, monkeypatch):
    """The single-block fused backward kernel and the split dQ/dKV pair
    must produce identical gradients (they share the math; the fused path
    just computes all three in one kernel). On-chip the agreement is
    bit-exact (analyzes/results_perf_r4/fused_split_onchip_diff.log)."""
    q, k, v = qkv
    slopes = alibi_slopes(H)
    seed = jnp.asarray(5, jnp.int32)
    cot = jax.random.normal(jax.random.key(3), (B, H, T, DH))

    def grads():
        def loss(q, k, v):
            return jnp.sum(
                flash_alibi_attention_train(q, k, v, slopes, seed, SCALE, 0.1)
                * cot
            )

        return jax.jit(
            lambda a, b, c: jax.grad(loss, argnums=(0, 1, 2))(a, b, c)
        )(q, k, v)

    monkeypatch.setenv("VAP_FLASH_BWD", "fused")
    gf = grads()
    monkeypatch.setenv("VAP_FLASH_BWD", "split")
    gs = grads()
    for a, b in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
