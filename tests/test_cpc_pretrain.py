"""CPC pretraining tests: loss sanity, learning signal, state updates."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.models.encoder import init_encoder
from voiceactivityprojection_tpu.train.cpc_pretrain import (
    cpc_forward,
    cpc_loss,
    init_cpc_heads,
    init_cpc_train_state,
    make_cpc_optimizer,
    make_cpc_train_step,
)

pytestmark = [pytest.mark.train, pytest.mark.slow]

DIM = 16
N_PRED = 4
N_NEG = 8


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(0)
    enc = init_encoder(jax.random.fold_in(key, 0), DIM)
    heads = init_cpc_heads(jax.random.fold_in(key, 1), N_PRED, DIM, DIM)
    return enc, heads


def test_cpc_forward_shapes(setup):
    enc, _ = setup
    w = jax.random.normal(jax.random.key(1), (2, 16000))  # 1 s
    z, c = cpc_forward(enc, w)
    assert z.shape == c.shape == (2, 100, DIM)  # 100 Hz encodings


def test_cpc_loss_near_chance_at_init(setup):
    enc, heads = setup
    w = 0.1 * jax.random.normal(jax.random.key(2), (2, 16000))
    loss, aux = cpc_loss(enc, heads, w, jax.random.key(3), N_PRED, N_NEG)
    # chance = -log(1/(N+1))
    chance = np.log(N_NEG + 1)
    assert 0.3 * chance < float(loss) < 3.0 * chance
    assert 0.0 <= float(aux["cpc_acc"]) <= 1.0


def test_cpc_training_reduces_loss(setup):
    enc, heads = setup
    tx = make_cpc_optimizer(1e-3)
    state = init_cpc_train_state(enc, heads, tx)
    step = make_cpc_train_step(tx, N_PRED, N_NEG)
    # a learnable toy signal: sinusoids with batch-varying frequency
    t = np.arange(16000) / 16000
    w = jnp.asarray(
        np.stack([np.sin(2 * np.pi * f * t) for f in (120.0, 260.0)]), jnp.float32
    )
    losses = []
    key = jax.random.key(4)
    for i in range(30):
        key, k = jax.random.split(key)
        state, aux = step(state, w, k)
        losses.append(float(aux["cpc_loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[::10]
    assert int(state.step) == 30


def test_pretrained_encoder_grafts_into_vap(tmp_path):
    """The {"encoder": ...} checkpoint written by pretrain_cpc.py must load
    into fresh VAP params via Trainer.fit(init_encoder_from=...)'s graft
    (restore with an encoder-only template)."""
    import numpy as np
    from voiceactivityprojection_tpu.config import VapConfig
    from voiceactivityprojection_tpu.models.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from voiceactivityprojection_tpu.models.encoder import init_encoder
    from voiceactivityprojection_tpu.models.vap import init_vap

    enc = init_encoder(jax.random.key(1), dim=16)
    path = str(tmp_path / "cpc_encoder")
    save_checkpoint(path, {"encoder": enc})

    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    params = init_vap(jax.random.key(0), conf)
    params["encoder"] = restore_checkpoint(
        path, {"encoder": params["encoder"]}
    )["encoder"]
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["gAR"]["w_ih"]),
        np.asarray(enc["gAR"]["w_ih"]),
    )
