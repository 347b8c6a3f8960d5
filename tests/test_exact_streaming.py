"""Exact streaming encoder: frames must equal the batch forward exactly
(the batch's final frames use symmetric-pad zeros the stream hasn't seen,
so the comparison excludes the trailing pipeline margin)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.models.encoder import apply_encoder, init_encoder
from voiceactivityprojection_tpu.models.encoder_streaming_exact import (
    ExactStreamingEncoder,
)

pytestmark = pytest.mark.inference

MARGIN = 2  # trailing frames where batch sees future zero-padding


@pytest.mark.parametrize("hop_frames", [1, 5, 16])
def test_exact_streaming_matches_batch(hop_frames):
    key = jax.random.key(0)
    params = init_encoder(key, dim=16)
    n_total = 16000  # 1 s -> 50 frames
    w = jax.random.normal(jax.random.key(1), (1, n_total))
    batch_out = np.asarray(apply_encoder(params, w))  # (1, 50, 16)

    hop = hop_frames * 320
    s = ExactStreamingEncoder(params, batch=1)
    frames = []
    for i in range(0, n_total, hop):
        frames.append(np.asarray(s.push(w[:, i : i + hop])))
    stream_out = np.concatenate(frames, axis=1)

    n = min(stream_out.shape[1], batch_out.shape[1]) - MARGIN
    np.testing.assert_allclose(
        stream_out[0, :n], batch_out[0, :n], atol=1e-5,
        err_msg=f"hop_frames={hop_frames}",
    )


def test_exact_streaming_chunk_invariance():
    params = init_encoder(jax.random.key(0), dim=16)
    w = jax.random.normal(jax.random.key(1), (1, 9600))

    def run(hop):
        s = ExactStreamingEncoder(params, batch=1)
        out = [np.asarray(s.push(w[:, i : i + hop])) for i in range(0, 9600, hop)]
        return np.concatenate(out, axis=1)

    a, b = run(320), run(1600)
    n = min(a.shape[1], b.shape[1])
    np.testing.assert_allclose(a[0, :n], b[0, :n], atol=1e-5)


def test_reset_restarts_stream():
    params = init_encoder(jax.random.key(0), dim=16)
    w = jax.random.normal(jax.random.key(1), (1, 3200))
    s = ExactStreamingEncoder(params, batch=1)
    a = np.asarray(s.push(w))
    s.reset()
    b = np.asarray(s.push(w))
    np.testing.assert_allclose(a, b, atol=0)
