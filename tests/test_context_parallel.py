"""Context (sequence) parallelism: exactness vs the single-device forward.

The 8-device CPU mesh shards the TIME axis; every stage must reproduce
the plain forward bit-for-bit up to f32 reduction order (conv margin
crop, GRU carry relay, downsample halo, offset attention with gathered
K/V). Mirrors the reference's single-shot semantics (run.py:223-229)
without its 164 s wall.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import forward, init_vap
from voiceactivityprojection_tpu.parallel.context import (
    forward_context_parallel,
    pad_waveform_for_mesh,
    probs_context_parallel,
)
from voiceactivityprojection_tpu.parallel.mesh import make_mesh


def _small_conf():
    return VapConfig()


@pytest.fixture(scope="module")
def setup():
    conf = _small_conf()
    params = init_vap(jax.random.key(0), conf)
    mesh = make_mesh()  # 8x1 on the CPU test mesh
    return conf, params, mesh


@pytest.mark.parametrize("t50", [16, 24])
def test_context_parallel_matches_forward(setup, t50):
    conf, params, mesh = setup
    n = t50 * 320
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(1, 2, n)).astype(np.float32) * 0.1)

    want = forward(params, wav, conf)
    got = forward_context_parallel(params, wav, conf, mesh)

    assert got["logits"].shape == want["logits"].shape
    assert got["vad"].shape == want["vad"].shape
    np.testing.assert_allclose(got["logits"], want["logits"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got["vad"], want["vad"], rtol=2e-4, atol=2e-4)


def test_context_parallel_probs(setup):
    conf, params, mesh = setup
    n = 16 * 320
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32) * 0.1)

    got = probs_context_parallel(params, wav, conf, mesh)
    out = forward(params, wav[None], conf)
    from voiceactivityprojection_tpu.models.vap import probs_from_logits

    want = probs_from_logits(out["logits"], out["vad"], conf)
    for key in ("p_now", "p_future", "H"):
        np.testing.assert_allclose(got[key], want[key], rtol=2e-4, atol=2e-4)


def test_pad_waveform_for_mesh():
    wav = jnp.ones((1, 2, 1000))
    out = pad_waveform_for_mesh(wav, 8)
    assert out.shape[-1] % (320 * 8) == 0
    np.testing.assert_array_equal(np.asarray(out[..., :1000]), np.ones((1, 2, 1000)))
    # already aligned input passes through untouched
    n = 320 * 8 * 3
    wav2 = jnp.ones((2, n))
    assert pad_waveform_for_mesh(wav2, 8) is wav2


def test_flash_offset_matches_dense_interpret():
    """Offset flash kernel (interpret mode on CPU) vs the dense math for a
    mid-sequence query block."""
    from voiceactivityprojection_tpu.ops.attention import alibi_slopes
    from voiceactivityprojection_tpu.ops import flash_alibi as fa

    B, H, Dh = 1, 4, 64
    T, Tq, off = 384, 128, 128
    rng = np.random.default_rng(2)
    mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q_full, k, v = mk((B, H, T, Dh)), mk((B, H, T, Dh)), mk((B, H, T, Dh))
    slopes = alibi_slopes(H)
    scale = 1.0 / np.sqrt(H * Dh)

    want = fa._dense_reference(q_full, k, v, slopes, scale)[:, :, off : off + Tq]
    got = fa.flash_alibi_attention_offset(
        q_full[:, :, off : off + Tq], k, v, slopes, scale, jnp.int32(off)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_context_parallel_single_device(setup):
    """Degenerate 1-device mesh: the d==0 slice branch covers the whole
    signal and must still reproduce the plain forward."""
    conf, params, _ = setup
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    n = 8 * 320
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.normal(size=(1, 2, n)).astype(np.float32) * 0.1)
    want = forward(params, wav, conf)
    got = forward_context_parallel(params, wav, conf, mesh)
    np.testing.assert_allclose(got["logits"], want["logits"], rtol=2e-4, atol=2e-4)


def test_context_parallel_bfloat16(setup):
    """Mixed-precision plumbing: bf16 compute must track the plain bf16
    forward (bf16-quantization tolerance; catches dtype bugs in the halo
    exchange / GRU relay / gathered K/V path)."""
    _, params, mesh = setup
    conf = VapConfig(dtype="bfloat16")
    n = 16 * 320
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.normal(size=(1, 2, n)).astype(np.float32) * 0.1)
    want = forward(params, wav, conf)
    got = forward_context_parallel(params, wav, conf, mesh)
    np.testing.assert_allclose(got["logits"], want["logits"], rtol=0.1, atol=0.05)
    np.testing.assert_allclose(got["vad"], want["vad"], rtol=0.1, atol=0.05)


def test_context_parallel_mono(setup):
    """Mono (VAD-conditioned) context-parallel forward matches forward_mono."""
    from voiceactivityprojection_tpu.config import VapMonoConfig
    from voiceactivityprojection_tpu.models.vap import forward_mono, init_vap_mono
    from voiceactivityprojection_tpu.parallel.context import (
        forward_mono_context_parallel,
    )

    _, _, mesh = setup
    conf = VapMonoConfig(va_history=0)
    params = init_vap_mono(jax.random.key(5), conf)
    t50 = 16
    n = t50 * 320
    rng = np.random.default_rng(6)
    wav = jnp.asarray(rng.normal(size=(1, 1, n)).astype(np.float32) * 0.1)
    va = jnp.asarray((rng.random((1, t50 + 10, 2)) < 0.4).astype(np.float32))

    want = forward_mono(params, wav, va, conf)
    got = forward_mono_context_parallel(params, wav, va, conf, mesh)
    np.testing.assert_allclose(
        got["logits"], want["logits"][:, :t50], rtol=2e-4, atol=2e-4
    )


def test_context_parallel_mono_va_history(setup):
    """The vah history conditioning (pointwise over time) shards exactly
    like va: context-parallel logits match the single-device
    forward_mono(va_history=...)."""
    from voiceactivityprojection_tpu.config import VapMonoConfig
    from voiceactivityprojection_tpu.models.vap import forward_mono, init_vap_mono
    from voiceactivityprojection_tpu.parallel.context import (
        forward_mono_context_parallel,
    )

    _, _, mesh = setup
    conf = VapMonoConfig(va_history=1)
    params = init_vap_mono(jax.random.key(7), conf)
    t50 = 16
    n = t50 * 320
    rng = np.random.default_rng(8)
    wav = jnp.asarray(rng.normal(size=(1, 1, n)).astype(np.float32) * 0.1)
    va = jnp.asarray((rng.random((1, t50 + 10, 2)) < 0.4).astype(np.float32))
    vah = jnp.asarray(rng.random((1, t50 + 10, 5)).astype(np.float32))

    want = forward_mono(params, wav, va, conf, va_history=vah)
    got = forward_mono_context_parallel(
        params, wav, va, conf, mesh, va_history=vah
    )
    np.testing.assert_allclose(
        got["logits"], want["logits"][:, :t50], rtol=2e-4, atol=2e-4
    )
    # and the history genuinely conditions the sharded path too
    got_no = forward_mono_context_parallel(params, wav, va, conf, mesh)
    assert float(jnp.abs(got["logits"] - got_no["logits"]).max()) > 1e-6
