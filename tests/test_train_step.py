"""Training-step tests: loss decreases, encoder freezing, LR plateau,
early stopping, and data-parallel sharding over the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import OptConfig, VapConfig
from voiceactivityprojection_tpu.models.vap import init_vap
from voiceactivityprojection_tpu.parallel.mesh import (
    make_mesh,
    replicate_tree,
    shard_batch,
)
from voiceactivityprojection_tpu.train.step import (
    EarlyStopping,
    ReduceLROnPlateau,
    get_learning_rate,
    init_train_state,
    loss_fn,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)

pytestmark = pytest.mark.train

CONF = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
OPT = OptConfig()


def small_batch(B=2, seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    frames = int(50 * seconds) + 100
    return {
        "waveform": rng.normal(size=(B, 2, n)).astype(np.float32) * 0.1,
        "vad": (rng.random((B, frames, 2)) < 0.5).astype(np.float32),
    }


def test_train_step_decreases_loss():
    params = init_vap(jax.random.key(0), CONF)
    tx = make_optimizer(OPT, freeze_encoder=True)
    state = init_train_state(params, tx)
    step = make_train_step(CONF, tx)
    batch = small_batch()
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 8


def test_frozen_encoder_unchanged():
    """freeze_encoder freezes the pretrained CPC subtrees (gEncoder conv
    stack + gAR GRU) EXACTLY — the learned downsample keeps training, like
    the reference's EncoderCPC.freeze() which flips requires_grad only on
    self.encoder (vap/encoder.py:39-42), leaving its sibling downsample
    (vap/encoder.py:23-31) trainable."""
    params = init_vap(jax.random.key(0), CONF)
    # the train step donates its input state, so snapshot before stepping
    before = jax.tree.map(np.asarray, params)
    tx = make_optimizer(OPT, freeze_encoder=True)
    state = init_train_state(params, tx)
    step = make_train_step(CONF, tx)
    state, _ = step(state, small_batch(), jax.random.key(0))
    for sub in ("gEncoder", "gAR"):
        for a, b in zip(
            jax.tree.leaves(before["encoder"][sub]),
            jax.tree.leaves(state.params["encoder"][sub]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the downsample AND non-encoder params must move
    for subtree in ("encoder", "vap_head"):
        a_tree = before[subtree]["downsample"] if subtree == "encoder" else before[subtree]
        b_tree = (
            state.params[subtree]["downsample"]
            if subtree == "encoder"
            else state.params[subtree]
        )
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree))
        )
        assert moved, f"{subtree} did not train"


def test_unfrozen_encoder_trains():
    # freeze flag must agree between conf (gradient stop) and optimizer mask
    conf = VapConfig(
        dim=16, encoder_dim=16, channel_layers=1, cross_layers=1,
        freeze_encoder=False,
    )
    params = init_vap(jax.random.key(0), conf)
    before = jax.tree.map(np.asarray, params["encoder"])
    tx = make_optimizer(OPT, freeze_encoder=False)
    state = init_train_state(params, tx)
    step = make_train_step(conf, tx)
    state, _ = step(state, small_batch(), jax.random.key(0))
    after = jax.tree.leaves(state.params["encoder"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), after)
    )


def test_alibi_slopes_never_train():
    """Reference stores ALiBi slopes as requires_grad=False parameters
    (modules.py:116-121): torch AdamW never updates them (no gradient step,
    no weight decay). Our optimizer must freeze every "m" leaf — including
    with an unfrozen encoder — and no gradient may reach them."""
    conf = VapConfig(
        dim=16, encoder_dim=16, channel_layers=1, cross_layers=1,
        freeze_encoder=False,
    )
    params = init_vap(jax.random.key(0), conf)

    def slope_leaves(tree):
        out = []
        jax.tree_util.tree_map_with_path(
            lambda path, leaf: out.append(np.asarray(leaf))
            if getattr(path[-1], "key", None) == "m"
            else None,
            tree,
        )
        return out

    before = slope_leaves(params)
    assert before, "expected ALiBi slope leaves in the param tree"

    grads = jax.grad(lambda p: loss_fn(p, small_batch(), conf)[0])(params)
    for g in slope_leaves(grads):
        np.testing.assert_array_equal(g, np.zeros_like(g))

    tx = make_optimizer(OPT, freeze_encoder=False)
    state = init_train_state(params, tx)
    step = make_train_step(conf, tx)
    state, _ = step(state, small_batch(), jax.random.key(0))
    for a, b in zip(before, slope_leaves(state.params)):
        np.testing.assert_array_equal(a, b)


def test_lr_plateau_and_early_stop():
    params = init_vap(jax.random.key(0), CONF)
    tx = make_optimizer(OPT, freeze_encoder=True)
    state = init_train_state(params, tx)
    assert get_learning_rate(state) == pytest.approx(OPT.learning_rate)

    plateau = ReduceLROnPlateau(factor=0.5, patience=2)
    state = plateau.update(state, 1.0)  # best
    state = plateau.update(state, 1.1)  # bad 1
    state = plateau.update(state, 1.2)  # bad 2
    assert get_learning_rate(state) == pytest.approx(OPT.learning_rate)
    state = plateau.update(state, 1.3)  # bad 3 > patience -> halve
    assert get_learning_rate(state) == pytest.approx(OPT.learning_rate * 0.5)

    es = EarlyStopping(patience=3)
    assert not es.update(1.0)
    assert not es.update(1.1)
    assert not es.update(1.2)
    assert es.update(1.3)  # 3rd bad epoch -> stop

    state = set_learning_rate(state, 1e-5)
    assert get_learning_rate(state) == pytest.approx(1e-5)


def test_eval_step():
    params = init_vap(jax.random.key(0), CONF)
    ev = make_eval_step(CONF)
    out = ev(params, small_batch())
    assert set(out) == {"vap_loss", "vad_loss", "logits", "vad_logits"}
    assert np.isfinite(float(out["vap_loss"]))


@pytest.mark.parallel
def test_data_parallel_step_matches_single_device():
    """The sharded step over the 8-device mesh must produce the same loss
    and updated params as the unsharded step (DP correctness)."""
    mesh = make_mesh(n_data=8)
    params = init_vap(jax.random.key(0), CONF)
    params_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    tx = make_optimizer(OPT, freeze_encoder=True)
    batch = small_batch(B=8, seconds=0.5)
    rng = jax.random.key(7)

    # single-device reference
    state1 = init_train_state(params, tx)
    step = make_train_step(CONF, tx)
    state1, m1 = step(state1, batch, rng)

    # sharded
    state2 = init_train_state(params_copy, tx)
    with jax.set_mesh(mesh):
        state2 = replicate_tree(state2, mesh)
        sbatch = shard_batch(batch, mesh)
        step2 = make_train_step(CONF, tx)
        state2, m2 = step2(state2, sbatch, rng)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree.leaves(state1.params["vap_head"]),
        jax.tree.leaves(state2.params["vap_head"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parallel
def test_graft_entry_dryrun():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out["logits"].shape == (1, 100, 256)
    g.dryrun_multichip(8)


def test_augmented_step_matches_manual_compose():
    """make_train_step_augmented == fold_in/split + augment_on_device +
    value_and_grad(loss_fn) + optax update, with the same subkeys (the
    single-dispatch pipeline must not change training math)."""
    import optax

    from voiceactivityprojection_tpu.train.augment import augment_on_device
    from voiceactivityprojection_tpu.train.step import (
        TrainState,
        init_train_state,
        loss_fn,
        make_optimizer,
        make_train_step_augmented,
    )
    from voiceactivityprojection_tpu.config import OptConfig, VapConfig
    from voiceactivityprojection_tpu.models.vap import init_vap

    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    params = init_vap(jax.random.key(0), conf)
    tx = make_optimizer(OptConfig(), conf.freeze_encoder)
    kw = dict(
        do_flip=True, flip_prob=0.5, do_mask=False, mask_prob=0.4,
        noise_amplitude=0.01, sample_rate=16_000, frame_hz=50,
    )
    step = make_train_step_augmented(conf, tx, mono=False, **kw)

    rng = np.random.default_rng(0)
    batch = {
        "waveform": jnp.asarray((rng.normal(size=(2, 2, 16000)) * 0.1).astype(np.float32)),
        "vad": jnp.asarray((rng.random((2, 150, 2)) < 0.5).astype(np.float32)),
    }
    base = jax.random.key(9)
    choice = 1  # noise branch

    # manual compose FIRST with identical key derivation (the fused step
    # donates its state, which aliases `params`' buffers)
    k = jax.random.fold_in(base, 0)  # state.step starts at 0
    k1, k3 = jax.random.split(k)
    aug = augment_on_device(dict(batch), k1, choice, **kw)
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, aug, conf, k3
    )
    opt_state0 = tx.init(params)
    updates, _ = tx.update(grads, opt_state0, params)
    want = optax.apply_updates(params, updates)
    want_leaf = np.asarray(want["vap_head"]["w"]).copy()

    state = init_train_state(params, tx)
    state2, metrics = step(state, dict(batch), base, choice)
    np.testing.assert_allclose(float(metrics["loss"]), float(loss), rtol=1e-6)
    got_leaf = np.asarray(state2.params["vap_head"]["w"])
    np.testing.assert_allclose(got_leaf, want_leaf, atol=1e-6)
    assert int(state2.step) == 1
