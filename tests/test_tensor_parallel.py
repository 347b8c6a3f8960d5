"""Tensor-parallel sharding tests: DP x TP mesh training step must match
the single-device step numerically (GSPMD inserts the collectives)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import OptConfig, VapConfig
from voiceactivityprojection_tpu.models.vap import forward, init_vap
from voiceactivityprojection_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch,
)
from voiceactivityprojection_tpu.parallel.tp import shard_params_tp, tp_param_specs
from voiceactivityprojection_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.parallel

CONF = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)


def small_batch(B=4):
    rng = np.random.default_rng(0)
    return {
        "waveform": rng.normal(size=(B, 2, 8000)).astype(np.float32) * 0.1,
        "vad": (rng.random((B, 125, 2)) < 0.5).astype(np.float32),
    }


def test_tp_specs_cover_tree():
    params = init_vap(jax.random.key(0), CONF)
    specs = tp_param_specs(params)
    # same tree structure
    assert jax.tree.structure(params) == jax.tree.structure(
        specs, is_leaf=lambda x: hasattr(x, "index") or x is None or str(type(x)).endswith("PartitionSpec'>")
    ) or len(jax.tree.leaves(specs)) == len(jax.tree.leaves(params))


def test_tp_forward_matches_replicated():
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_vap(jax.random.key(0), CONF)
    w = jnp.asarray(small_batch()["waveform"])

    want = np.asarray(forward(params, w, CONF)["logits"])

    with jax.set_mesh(mesh):
        p_tp = shard_params_tp(params, mesh)
        w_sh = jax.device_put(w, batch_sharding(mesh))
        out = jax.jit(lambda p, x: forward(p, x, CONF))(p_tp, w_sh)
        got = np.asarray(out["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_tp_train_step_matches_single_device():
    params = init_vap(jax.random.key(0), CONF)
    params_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    tx = make_optimizer(OptConfig(), freeze_encoder=True)
    batch = small_batch(B=4)
    rng = jax.random.key(7)

    state1 = init_train_state(params, tx)
    step = make_train_step(CONF, tx)
    state1, m1 = step(state1, batch, rng)

    mesh = make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        state2 = init_train_state(params_copy, tx)
        state2 = replicate_tree(state2, mesh)
        state2 = state2._replace(params=shard_params_tp(state2.params, mesh))
        sbatch = shard_batch(batch, mesh)
        step2 = make_train_step(CONF, tx)
        state2, m2 = step2(state2, sbatch, rng)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(
        jax.tree.leaves(state1.params["vap_head"]),
        jax.tree.leaves(state2.params["vap_head"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
