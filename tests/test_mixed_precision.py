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
