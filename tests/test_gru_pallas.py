"""Pallas GRU recurrence kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.gru import gru, init_gru

pytestmark = [pytest.mark.encoder, pytest.mark.slow]


@pytest.mark.parametrize("B,T", [(1, 16), (3, 33), (8, 20)])
def test_pallas_gru_matches_scan(B, T):
    params = init_gru(jax.random.key(0), 128, 128)
    x = jax.random.normal(jax.random.key(1), (B, T, 128))
    ys_s, h_s = gru(params, x, impl="scan")
    ys_p, h_p = gru(params, x, impl="pallas")
    np.testing.assert_allclose(np.asarray(ys_s), np.asarray(ys_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_p), atol=1e-5)


def test_pallas_gru_with_initial_state():
    params = init_gru(jax.random.key(0), 128, 128)
    x = jax.random.normal(jax.random.key(1), (2, 9, 128))
    h0 = jax.random.normal(jax.random.key(2), (2, 128))
    ys_s, _ = gru(params, x, h0=h0, impl="scan")
    ys_p, _ = gru(params, x, h0=h0, impl="pallas")
    np.testing.assert_allclose(np.asarray(ys_s), np.asarray(ys_p), atol=1e-5)


@pytest.mark.parametrize("groups", [2, 4])
def test_pallas_gru_groups_match_scan(monkeypatch, groups):
    """VAP_GRU_GROUPS splits batch rows into independent interleaved groups
    — a pure scheduling change, so the math must match scan exactly."""
    monkeypatch.setenv("VAP_GRU_GROUPS", str(groups))
    params = init_gru(jax.random.key(0), 128, 128)
    x = jax.random.normal(jax.random.key(1), (5, 24, 128))  # B pads to 8*G
    h0 = jax.random.normal(jax.random.key(2), (5, 128))
    ys_s, h_s = gru(params, x, h0=h0, impl="scan")
    ys_p, h_p = gru(params, x, h0=h0, impl="pallas")
    np.testing.assert_allclose(np.asarray(ys_s), np.asarray(ys_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_p), atol=1e-5)


@pytest.mark.parametrize("groups", [2, 4])
def test_gru_downsample_fused_groups(monkeypatch, groups):
    """The fused GRU+downsample kernel under batch-group interleave must
    match the unfused pipeline."""
    from voiceactivityprojection_tpu.ops.gru_pallas import gru_downsample_fused
    from voiceactivityprojection_tpu.ops.conv import (
        causal_conv1d,
        init_conv1d,
        init_norm,
        layer_norm,
    )

    monkeypatch.setenv("VAP_GRU_GROUPS", str(groups))
    B, T, H = 3, 16, 128
    ks = jax.random.split(jax.random.key(7), 3)
    g = init_gru(ks[0], H, H)
    conv = init_conv1d(ks[1], 5, H, H)
    ln = init_norm(H)
    x = jax.random.normal(ks[2], (B, T, H)) * 0.5

    y, _ = gru(g, x, impl="scan")
    want = causal_conv1d(y, conv["w"], conv["b"], stride=2)
    want = layer_norm(want, ln["w"], ln["b"])
    want = jax.nn.gelu(want, approximate=False)

    x_proj = x @ g["w_ih"] + g["b_ih"]
    got = gru_downsample_fused(
        x_proj, g["w_hh"], g["b_hh"], jnp.zeros((B, H)),
        conv["w"], conv["b"], ln["w"], ln["b"],
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_unsupported_hidden_falls_back():
    # hidden 96 not lane-aligned -> auto must fall back to scan, not crash
    params = init_gru(jax.random.key(0), 96, 96)
    x = jax.random.normal(jax.random.key(1), (2, 7, 96))
    ys, h = gru(params, x, impl="auto")
    assert ys.shape == (2, 7, 96)


def test_gru_downsample_fused_matches_unfused():
    """Fused GRU+downsample epilogue (interpret mode) == gru() followed by
    the causal k=5 s=2 conv + LN + GELU."""
    import numpy as np
    from voiceactivityprojection_tpu.ops.gru_pallas import gru_downsample_fused
    from voiceactivityprojection_tpu.ops.gru import gru, init_gru
    from voiceactivityprojection_tpu.ops.conv import (
        causal_conv1d,
        init_conv1d,
        init_norm,
        layer_norm,
    )

    B, T, H = 3, 48, 128
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    g = init_gru(ks[0], H, H)
    conv = init_conv1d(ks[1], 5, H, H)
    ln = init_norm(H)
    x = jax.random.normal(ks[2], (B, T, H)) * 0.5

    y, _ = gru(g, x, impl="scan")
    want = causal_conv1d(y, conv["w"], conv["b"], stride=2)
    want = layer_norm(want, ln["w"], ln["b"])
    want = jax.nn.gelu(want, approximate=False)

    x_proj = x @ g["w_ih"] + g["b_ih"]
    h0 = jnp.zeros((B, H))
    got = gru_downsample_fused(
        x_proj, g["w_hh"], g["b_hh"], h0, conv["w"], conv["b"], ln["w"], ln["b"]
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_epilogue_under_grad_requires_stop_gradient():
    """Regression (round-2): frozen-encoder TRAINING differentiates the
    whole forward; the fused GRU+downsample kernel has no JVP rule, so
    models/vap.forward must stop_gradient the encoder PARAMS (zero
    tangents -> the kernel is never differentiated). Verify both halves
    of that contract: tangent-carrying inputs blow up, stop-gradiented
    inputs run fine inside jax.grad."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voiceactivityprojection_tpu.ops.gru_pallas import gru_downsample_fused

    B, T, H = 2, 16, 128
    rng = np.random.default_rng(0)
    args = dict(
        x_proj=jnp.asarray(rng.normal(size=(B, T, 3 * H)).astype(np.float32)),
        w_hh=jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1),
        b_hh=jnp.zeros((3 * H,), jnp.float32),
        h0=jnp.zeros((B, H), jnp.float32),
        w_d=jnp.asarray(rng.normal(size=(5, H, H)).astype(np.float32) * 0.1),
        b_d=jnp.zeros((H,), jnp.float32),
        ln_w=jnp.ones((H,), jnp.float32),
        ln_b=jnp.zeros((H,), jnp.float32),
    )

    def loss_frozen(w_hh, rest):
        w = jax.lax.stop_gradient(w_hh)
        out = gru_downsample_fused(
            jax.lax.stop_gradient(rest["x_proj"]), w, rest["b_hh"],
            rest["h0"], rest["w_d"], rest["b_d"], rest["ln_w"], rest["ln_b"],
        )
        # give grad SOMETHING differentiable downstream, like the VAP head
        return (out.sum() * (w_hh.sum() * 0 + 1.0)).sum()

    g = jax.grad(loss_frozen)(args["w_hh"], args)
    assert np.all(np.isfinite(np.asarray(g)))

    def loss_hot(w_hh, rest):
        out = gru_downsample_fused(
            rest["x_proj"], w_hh, rest["b_hh"],
            rest["h0"], rest["w_d"], rest["b_d"], rest["ln_w"], rest["ln_b"],
        )
        return out.sum()

    import pytest as _pytest

    with _pytest.raises(Exception):
        jax.grad(loss_hot)(args["w_hh"], args)


@pytest.mark.parametrize("B,T", [(2, 16), (3, 33)])
def test_pallas_gru_backward_matches_scan_bptt(B, T):
    """The Pallas reverse-recurrence backward (VAP_GRU_BWD=pallas default)
    must produce the same grads as scan BPTT for ALL inputs — x, both
    recurrent weights, and h0 — including ragged T (time padding) and a
    nonzero h_last cotangent."""
    from voiceactivityprojection_tpu.ops.gru_pallas import (
        _scan_recurrence,
        gru_recurrence_pallas,
    )

    H = 128
    ks = jax.random.split(jax.random.key(3), 5)
    xp = jax.random.normal(ks[0], (B, T, 3 * H)) * 0.5
    w_hh = jax.random.normal(ks[1], (H, 3 * H)) * 0.08
    b_hh = jax.random.normal(ks[2], (3 * H,)) * 0.1
    h0 = jax.random.normal(ks[3], (B, H)) * 0.5
    # loss touches ys AND h_last so the dh_last fold-in is exercised
    wy = jax.random.normal(ks[4], (B, T, H))

    def loss(fn):
        def f(xp, w, b, h):
            ys, hl = fn(xp, w, b, h)
            return (ys * wy).sum() + (hl ** 2).sum()
        return f

    g_ref = jax.grad(loss(_scan_recurrence), argnums=(0, 1, 2, 3))(
        xp, w_hh, b_hh, h0
    )
    g_ker = jax.grad(loss(gru_recurrence_pallas), argnums=(0, 1, 2, 3))(
        xp, w_hh, b_hh, h0
    )
    names = ("dx_proj", "dw_hh", "db_hh", "dh0")
    for name, a, b in zip(names, g_ref, g_ker):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=name,
        )


def test_pallas_gru_backward_env_fallback(monkeypatch):
    """VAP_GRU_BWD=scan selects the BPTT fallback; both paths agree."""
    from voiceactivityprojection_tpu.ops.gru_pallas import (
        gru_recurrence_pallas,
    )

    H = 128
    ks = jax.random.split(jax.random.key(9), 4)
    xp = jax.random.normal(ks[0], (2, 24, 3 * H)) * 0.5
    w_hh = jax.random.normal(ks[1], (H, 3 * H)) * 0.08
    b_hh = jax.random.normal(ks[2], (3 * H,)) * 0.1
    h0 = jnp.zeros((2, H))

    def f(xp, w):
        ys, _ = gru_recurrence_pallas(xp, w, b_hh, h0)
        return (ys ** 2).sum()

    monkeypatch.setenv("VAP_GRU_BWD", "pallas")
    g_p = jax.grad(f, argnums=(0, 1))(xp, w_hh)
    monkeypatch.setenv("VAP_GRU_BWD", "scan")
    g_s = jax.grad(f, argnums=(0, 1))(xp, w_hh)
    for a, b in zip(g_p, g_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
        )
