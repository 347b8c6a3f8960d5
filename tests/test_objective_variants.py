"""Independent & comparative objective representation tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import (
    VapModel,
    forward,
    init_vap,
    probs_from_logits,
)
from voiceactivityprojection_tpu.ops import objective_variants as ov

pytestmark = pytest.mark.objective

BIN_FRAMES = [10, 20, 30, 40]


def test_head_dims():
    base = dict(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    assert VapConfig(**base).head_dim == 256
    assert VapConfig(**base, representation="independent").head_dim == 8
    assert VapConfig(**base, representation="comparative").head_dim == 1


def test_independent_labels_match_projection_bins():
    rng = np.random.default_rng(0)
    vad = (rng.random((2, 300, 2)) < 0.5).astype(np.float32)
    labels = np.asarray(ov.get_labels_independent(jnp.asarray(vad), BIN_FRAMES))
    assert labels.shape == (2, 200, 2, 4)
    assert set(np.unique(labels)).issubset({0.0, 1.0})


def test_comparative_labels_range_and_semantics():
    vad = np.zeros((1, 300, 2), dtype=np.float32)
    vad[0, :150, 0] = 1.0  # only A active in first half
    labels = np.asarray(ov.get_labels_comparative(jnp.asarray(vad), BIN_FRAMES))
    assert labels.shape == (1, 200)
    # early windows: only A -> share 1.0; silent tail windows -> 0.5
    assert labels[0, 0] == pytest.approx(1.0)
    assert labels[0, -1] == pytest.approx(0.5)
    assert (labels >= 0).all() and (labels <= 1).all()


def test_independent_loss_and_probs():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 200, 8)).astype(np.float32))
    vad = jnp.asarray((rng.random((2, 300, 2)) < 0.5).astype(np.float32))
    labels = ov.get_labels_independent(vad, BIN_FRAMES)
    loss = float(ov.loss_vap_independent(logits, labels))
    assert np.isfinite(loss) and loss > 0
    p = np.asarray(ov.probs_independent(logits, BIN_FRAMES, 0, 1))
    assert p.shape == (2, 200, 2)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-3)


@pytest.mark.parametrize("rep", ["independent", "comparative"])
def test_model_forward_and_probs_variant(rep):
    conf = VapConfig(
        dim=16, encoder_dim=16, channel_layers=1, cross_layers=1,
        representation=rep,
    )
    model = VapModel.init(jax.random.key(0), conf)
    w = 0.1 * jax.random.normal(jax.random.key(1), (1, 2, 16000))
    out = model.forward(w)
    assert out["logits"].shape == (1, 50, conf.head_dim)
    probs = model.probs(w)
    assert probs["p_now"].shape == (1, 50, 2)
    s = np.asarray(probs["p_now"]).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-3)
    assert (np.asarray(probs["H"]) >= 0).all()


@pytest.mark.parametrize("rep", ["independent", "comparative"])
def test_training_step_variant(rep):
    from voiceactivityprojection_tpu.config import OptConfig
    from voiceactivityprojection_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    conf = VapConfig(
        dim=16, encoder_dim=16, channel_layers=1, cross_layers=1,
        representation=rep,
    )
    params = init_vap(jax.random.key(0), conf)
    tx = make_optimizer(OptConfig(), freeze_encoder=True)
    state = init_train_state(params, tx)
    step = make_train_step(conf, tx)
    rng = np.random.default_rng(0)
    batch = {
        "waveform": jnp.asarray(rng.normal(size=(2, 2, 16000)).astype(np.float32)),
        "vad": jnp.asarray((rng.random((2, 150, 2)) < 0.5).astype(np.float32)),
    }
    losses = []
    for i in range(5):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
