"""Mixed-precision mode: bfloat16 compute must track the f32 forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import forward, init_vap

pytestmark = pytest.mark.model


def test_bf16_forward_tracks_f32():
    conf32 = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    conf16 = VapConfig(
        dim=16, encoder_dim=16, channel_layers=1, cross_layers=1, dtype="bfloat16"
    )
    params = init_vap(jax.random.key(0), conf32)
    w = 0.1 * jax.random.normal(jax.random.key(1), (1, 2, 16000))

    out32 = forward(params, w, conf32)
    out16 = forward(params, w, conf16)

    # outputs come back f32
    assert out16["logits"].dtype == jnp.float32
    assert out16["vad"].dtype == jnp.float32

    p32 = np.asarray(jax.nn.softmax(out32["logits"], -1))
    p16 = np.asarray(jax.nn.softmax(out16["logits"], -1))
    # probability-level agreement (bf16 matmuls; norms/softmax stay f32)
    assert np.abs(p32 - p16).max() < 0.05
    corr = np.corrcoef(p32.ravel(), p16.ravel())[0, 1]
    assert corr > 0.98, corr


def test_bf16_forward_mono_tracks_f32():
    """forward_mono honors conf.dtype like the stereo forward (the VAD
    conditioning joins the features in compute dtype; logits come back
    f32)."""
    from voiceactivityprojection_tpu.config import VapMonoConfig
    from voiceactivityprojection_tpu.models.vap import forward_mono, init_vap_mono

    kw = dict(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    conf32 = VapMonoConfig(**kw)
    conf16 = VapMonoConfig(dtype="bfloat16", **kw)
    params = init_vap_mono(jax.random.key(0), conf32)
    w = 0.1 * jax.random.normal(jax.random.key(1), (1, 1, 16000))
    va = (
        jax.random.uniform(jax.random.key(2), (1, 50, 2)) > 0.5
    ).astype(jnp.float32)

    out32 = forward_mono(params, w, va, conf32)
    out16 = forward_mono(params, w, va, conf16)

    assert out32["logits"].dtype == jnp.float32
    assert out16["logits"].dtype == jnp.float32
    p32 = np.asarray(jax.nn.softmax(out32["logits"], -1))
    p16 = np.asarray(jax.nn.softmax(out16["logits"], -1))
    assert np.abs(p32 - p16).max() < 0.05
    corr = np.corrcoef(p32.ravel(), p16.ravel())[0, 1]
    assert corr > 0.98, corr


def test_bf16_attention_close_to_f32():
    """The bf16 score-storage softmax stays within bf16 quantization of the
    f32 dense path (ops/attention.py fast path)."""
    import numpy as np

    from voiceactivityprojection_tpu.ops.attention import attention_dense, init_mha

    params = init_mha(jax.random.key(0), dim=64, num_heads=2)
    x = jax.random.normal(jax.random.key(1), (2, 128, 64)) * 0.5

    out_f32, w_f32 = attention_dense(params, x, x, num_heads=2, return_weights=True)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    p16["m"] = params["m"]
    out_bf16, w16 = attention_dense(
        p16, x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), num_heads=2
    )
    assert out_bf16.dtype == jnp.bfloat16
    assert w16 is None
    np.testing.assert_allclose(
        np.asarray(out_bf16, dtype=np.float32), np.asarray(out_f32), atol=3e-2
    )
