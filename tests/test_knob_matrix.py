"""Cross-knob regression net (VERDICT r4 weak #6).

Every `VAP_*` implementation knob is swept at the highest level it can
reach on CPU and asserted against the default path on IDENTICAL inputs —
a stale A/B leftover that drifts from the default math fails here, not in
an on-chip run three rounds later. Pallas kernels run in interpret mode
(each kernel's pallas_call sets interpret on the cpu backend).

Knobs and the level each is exercised at:
  VAP_CONV_IMPL (xla|fused|fused_stack)  — full stereo forward
  VAP_FLASH_SINGLE_IMPL (v1|v2|tri) + VAP_FLASH_CS — full forward with
      attn_impl='pallas' (forces the flash kernel on CPU)
  VAP_FLASH_BWD (fused|split)            — transformer-section grads with
      attn_impl='pallas' and dropout>0 (the train path)
  VAP_GRU_GROUPS (1|2|4)                 — encoder output, Pallas GRU
      forced, vs the lax.scan default
  VAP_GRU_DS (fused|off)                 — the TPU-default fused
      GRU+downsample epilogue composition vs apply_encoder's unfused path
      (the gate itself is TPU-only, so the composition is built here
      exactly as models/encoder.py:160-181 builds it)

Env knobs are read at TRACE time; every sweep below traces eagerly (no
jit wrapper), so each monkeypatch.setenv takes effect immediately.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.encoder import apply_encoder, init_encoder
from voiceactivityprojection_tpu.models.vap import forward, init_vap

pytestmark = [pytest.mark.slow]

SR = 16_000
DUR_S = 2.0


@pytest.fixture(scope="module")
def conf():
    return VapConfig()  # f32, dim 256 (the kernels' supported width)


@pytest.fixture(scope="module")
def params(conf):
    return init_vap(jax.random.key(0), conf)


@pytest.fixture(scope="module")
def waveform():
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.normal(size=(1, 2, int(SR * DUR_S))).astype(np.float32) * 0.1
    )


def _logits(params, waveform, conf, **kw):
    out = forward(params, waveform, conf, rng=None, **kw)
    return np.asarray(out["logits"], dtype=np.float64)


def test_conv_impl_matrix(params, waveform, conf, monkeypatch):
    monkeypatch.setenv("VAP_CONV_IMPL", "xla")
    want = _logits(params, waveform, conf)
    for impl in ("fused", "fused_stack"):
        monkeypatch.setenv("VAP_CONV_IMPL", impl)
        got = _logits(params, waveform, conf)
        np.testing.assert_allclose(
            got, want, atol=2e-4, err_msg=f"VAP_CONV_IMPL={impl}"
        )
    monkeypatch.delenv("VAP_CONV_IMPL")
    got = _logits(params, waveform, conf)  # auto (CPU -> xla) == xla
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_flash_single_impl_matrix(params, waveform, conf, monkeypatch):
    """All single-block flash variants must agree with the XLA dense
    attention through the full forward (attn weights never requested)."""
    want = _logits(params, waveform, conf)  # CPU auto -> dense XLA
    pconf = VapConfig(attn_impl="pallas")
    for impl in ("v1", "v2", "tri"):
        monkeypatch.setenv("VAP_FLASH_SINGLE_IMPL", impl)
        got = _logits(params, waveform, pconf)
        np.testing.assert_allclose(
            got, want, atol=2e-4, err_msg=f"VAP_FLASH_SINGLE_IMPL={impl}"
        )
    monkeypatch.setenv("VAP_FLASH_SINGLE_IMPL", "v1")
    monkeypatch.setenv("VAP_FLASH_CS", "128")
    got = _logits(params, waveform, pconf)
    np.testing.assert_allclose(got, want, atol=2e-4, err_msg="VAP_FLASH_CS=128")


def test_flash_bwd_matrix(params, waveform, conf, monkeypatch):
    """Training path: grads of a transformer-section loss under the fused
    single-block flash backward vs the split pair (VAP_FLASH_BWD) — the
    b4a31f4 agreement test generalized to the full attention call site,
    with in-kernel hash dropout active (same seed -> same mask)."""
    from voiceactivityprojection_tpu.models.transformer import apply_gpt

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 100, conf.dim)).astype(np.float32) * 0.1)
    gpt = params["ar_channel"]
    key = jax.random.key(3)

    def loss(p, impl_env):
        out = apply_gpt(p, x, num_heads=conf.num_heads, dropout=0.1,
                        rng=key, attn_impl="pallas")
        return (out["x"].astype(jnp.float32) ** 2).sum()

    grads = {}
    for mode in ("fused", "split"):
        monkeypatch.setenv("VAP_FLASH_BWD", mode)
        grads[mode] = jax.grad(loss)(gpt, mode)
    flat_f = jax.tree.leaves(grads["fused"])
    flat_s = jax.tree.leaves(grads["split"])
    for gf, gs in zip(flat_f, flat_s):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gs), atol=2e-4, rtol=2e-4
        )


@pytest.mark.parametrize("groups", [1, 2, 4])
def test_gru_groups_matrix(params, waveform, monkeypatch, groups):
    """Encoder-level: Pallas GRU recurrence at every batch-group setting
    equals the lax.scan default on the same conv features."""
    from voiceactivityprojection_tpu.models.encoder import _conv_stack
    from voiceactivityprojection_tpu.ops.gru import gru

    enc = params["encoder"]
    both = waveform.reshape(2, -1)
    feats = _conv_stack(enc, both[..., None])
    want, hw = gru(enc["gAR"], feats, impl="scan")
    monkeypatch.setenv("VAP_GRU_GROUPS", str(groups))
    got, hg = gru(enc["gAR"], feats, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(hg), np.asarray(hw), atol=2e-4)


def test_conv_stack_tile_knobs_matrix(params, waveform, conf, monkeypatch):
    """fused_stack's tiling (VAP_CONV_T1OUT) and row-prep layout
    (VAP_CONV_ROWPREP=write) are pure scheduling knobs — outputs must
    match the XLA path bit-for-tolerance at every setting."""
    monkeypatch.setenv("VAP_CONV_IMPL", "xla")
    want = _logits(params, waveform, conf)
    monkeypatch.setenv("VAP_CONV_IMPL", "fused_stack")
    for t1out in ("1024", "2048"):
        monkeypatch.setenv("VAP_CONV_T1OUT", t1out)
        got = _logits(params, waveform, conf)
        np.testing.assert_allclose(
            got, want, atol=2e-4, err_msg=f"VAP_CONV_T1OUT={t1out}"
        )
    monkeypatch.delenv("VAP_CONV_T1OUT")
    monkeypatch.setenv("VAP_CONV_ROWPREP", "write")
    got = _logits(params, waveform, conf)
    np.testing.assert_allclose(got, want, atol=2e-4,
                               err_msg="VAP_CONV_ROWPREP=write")


def test_gru_bwd_matrix(params, waveform, monkeypatch):
    """VAP_GRU_BWD pallas-vs-scan grads through the Pallas recurrence on
    encoder-shaped features (the op-level sweep lives in
    tests/test_gru_pallas.py; this anchors the knob in the matrix)."""
    from voiceactivityprojection_tpu.models.encoder import _conv_stack
    from voiceactivityprojection_tpu.ops.gru_pallas import (
        gru_recurrence_pallas,
    )

    enc = params["encoder"]
    both = waveform.reshape(2, -1)
    feats = _conv_stack(enc, both[..., None])
    g = enc["gAR"]
    xp = feats @ g["w_ih"] + g["b_ih"]
    h0 = jnp.zeros((2, g["w_hh"].shape[0]), feats.dtype)

    def loss(xp, w):
        ys, _ = gru_recurrence_pallas(xp, w, g["b_hh"], h0)
        return (ys ** 2).sum()

    grads = {}
    for mode in ("pallas", "scan"):
        monkeypatch.setenv("VAP_GRU_BWD", mode)
        grads[mode] = jax.grad(loss, argnums=(0, 1))(xp, g["w_hh"])
    for a, b in zip(grads["pallas"], grads["scan"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
        )


def test_gru_ds_matrix(params, waveform):
    """The fused GRU+downsample epilogue (TPU default, VAP_GRU_DS=fused)
    built exactly as models/encoder.py:160-181 builds it must match the
    unfused apply_encoder output (which is what VAP_GRU_DS=off runs)."""
    from voiceactivityprojection_tpu.ops.gru_pallas import gru_downsample_fused

    enc = params["encoder"]
    both = waveform.reshape(2, -1)
    want = apply_encoder(enc, both)  # CPU: unfused epilogue

    from voiceactivityprojection_tpu.models.encoder import _conv_stack

    z = _conv_stack(enc, both[..., None])
    g = enc["gAR"]
    d = enc["downsample"]
    x_proj = z @ g["w_ih"] + g["b_ih"]
    h0 = jnp.zeros((z.shape[0], g["w_hh"].shape[0]), dtype=z.dtype)
    got = gru_downsample_fused(
        x_proj, g["w_hh"], g["b_hh"], h0,
        d["conv"]["w"], d["conv"]["b"], d["ln"]["w"], d["ln"]["b"],
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4
    )
