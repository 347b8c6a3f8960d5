"""Chunked-extraction stitching parity.

The reference's sliding-window logic (run.py:23-131, extraction.py:176-260)
keeps chunk 0 whole, each later chunk's last step_frames, and re-runs the
final window for the remainder. This test replaces the model with a probe
whose 'probability' at each frame IS the absolute frame index, so the
stitched output must be exactly [0, 1, ..., total_frames-1] — any
off-by-one in chunk math shows up directly.
"""

import numpy as np
import pytest

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.inference.extraction import VapExtractor

pytestmark = pytest.mark.inference


class FrameIndexModel:
    """Stands in for VapModel: probs() returns each frame's ABSOLUTE index,
    recoverable because the probe knows chunk positions are unknown —
    so instead it returns indices *relative to the chunk*, and the test
    reconstructs absolute indices from the stitching offsets."""

    def __init__(self):
        self.conf = VapConfig()

    def probs(self, waveform, vad=None):
        import jax.numpy as jnp

        B = waveform.shape[0]
        n_frames = int(waveform.shape[-1] / 16000 * 50)
        idx = jnp.broadcast_to(
            jnp.arange(n_frames, dtype=jnp.float32)[None, :], (B, n_frames)
        )
        return {
            "probs": idx[..., None],
            "p_now": jnp.stack([idx, idx], -1),
            "p_future": jnp.stack([idx, idx], -1),
            "vad": jnp.stack([idx, idx], -1),
            "H": idx,
        }


def reference_stitch_indices(n_samples, context_time=4.0, step_time=1.0):
    """NumPy mock of the reference's frame bookkeeping: which chunk-relative
    frame index lands at each output frame."""
    sr, hz = 16000, 50
    chunk_s = int((context_time + step_time) * sr)
    step_s = int(step_time * sr)
    chunk_f = int((context_time + step_time) * hz)
    step_f = int(step_time * hz)
    total_f = int(n_samples / sr * hz)

    out = list(range(chunk_f))  # chunk 0 kept whole (chunk-relative == abs)
    starts = list(range(0, n_samples - chunk_s + 1, step_s))
    for _ in starts[1:]:
        out.extend(range(chunk_f - step_f, chunk_f))  # last step_frames
    covered = starts[-1] + chunk_s
    if covered < n_samples:
        remain = total_f - len(out)
        out.extend(range(chunk_f - remain, chunk_f))  # tail re-run window
    return np.asarray(out, dtype=np.float32)


@pytest.mark.parametrize("seconds", [9.0, 12.3, 17.0])
def test_stitched_indices_match_reference_semantics(seconds):
    model = FrameIndexModel()
    ex = VapExtractor(model, context_time=4.0, step_time=1.0, chunk_batch=3)
    n = int(seconds * 16000)
    w = np.zeros((1, 2, n), dtype=np.float32)
    out = ex.step_extraction(w)
    got = out["H"][0]
    want = reference_stitch_indices(n)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)
    # absolute-frame coverage: every output frame present exactly once
    assert len(got) == int(seconds * 50)


def test_stitched_loss_dispatches_on_representation():
    """The post-hoc stitched loss must use the OBJECTIVE'S OWN loss: the
    discrete codebook CE applied to an 8-wide sigmoid plane would silently
    clamp indices (garbage, no crash). Reconstructed-logit loss == the
    true-logit loss for every representation."""
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.ops import objective_variants as ov
    from voiceactivityprojection_tpu.ops.codebook import get_labels
    from voiceactivityprojection_tpu.ops.losses import loss_vap

    rng = np.random.default_rng(0)
    T = 120
    vad = (rng.random((1, T, 2)) > 0.5).astype(np.float32)
    bf = VapConfig().bin_frames

    class Stub:
        def __init__(self, rep):
            self.conf = VapConfig(representation=rep)

    # independent: (1, T, 8) Bernoulli logits
    logits = rng.normal(size=(1, T, 8)).astype(np.float32)
    got = VapExtractor(Stub("independent"))._stitched_loss(
        1.0 / (1.0 + np.exp(-logits)), vad
    )
    want = np.asarray(ov.loss_vap_independent(
        jnp.asarray(logits), ov.get_labels_independent(jnp.asarray(vad), bf),
        reduction="none",
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # comparative: (1, T, 1) logit of speaker A's share
    logits = rng.normal(size=(1, T, 1)).astype(np.float32)
    got = VapExtractor(Stub("comparative"))._stitched_loss(
        1.0 / (1.0 + np.exp(-logits)), vad
    )
    want = np.asarray(ov.loss_vap_comparative(
        jnp.asarray(logits), ov.get_labels_comparative(jnp.asarray(vad), bf),
        reduction="none",
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # discrete: softmax probs -> identical CE (shift-invariance of log p)
    logits = rng.normal(size=(1, T, 256)).astype(np.float32)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    got = VapExtractor(Stub("discrete"))._stitched_loss(p, vad)
    want = np.asarray(loss_vap(
        jnp.asarray(logits), get_labels(jnp.asarray(vad), bf), reduction="none"
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
