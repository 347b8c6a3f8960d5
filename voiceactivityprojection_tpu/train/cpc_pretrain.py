"""Self-supervised CPC pretraining for the audio encoder.

The reference never trains its encoder: it downloads facebookresearch/
CPC_audio's libri-light 60k checkpoint at first use
(encoder_components.py:371-379) and freezes it. That download is
unreachable in zero-egress deployments, so this module makes the framework
self-sufficient: contrastive predictive coding (InfoNCE) over the same
architecture (conv stack -> GRU context), with the CPC_audio defaults
(nPredicts=12 future steps, 128 negatives, encoder_components.py:218-226).

Objective: for each context vector c_t and step k in 1..K, score the true
future encoding z_{t+k} against negatives drawn from the batch via a
per-step bilinear head W_k; minimize softmax CE with the positive in slot 0.

All sampling is device-side (jax.random) with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from voiceactivityprojection_tpu.models.encoder import _conv_stack
from voiceactivityprojection_tpu.ops.gru import gru

Params = Dict[str, Any]


def init_cpc_heads(key: jax.Array, n_predicts: int, ar_dim: int, enc_dim: int) -> Params:
    ks = jax.random.split(key, n_predicts)
    scale = 1.0 / jnp.sqrt(ar_dim)
    return {
        "W": jnp.stack(
            [scale * jax.random.normal(k, (ar_dim, enc_dim)) for k in ks]
        )  # (K, ar_dim, enc_dim)
    }


def cpc_forward(encoder_params: Params, waveform: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """waveform (B, n) -> (z (B, T, C) encodings @100 Hz, c (B, T, C) context)."""
    z = _conv_stack(encoder_params, waveform[..., None])
    c, _ = gru(encoder_params["gAR"], z)
    return z, c


def cpc_loss(
    encoder_params: Params,
    head_params: Params,
    waveform: jax.Array,
    rng: jax.Array,
    n_predicts: int = 12,
    n_negatives: int = 128,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    z, c = cpc_forward(encoder_params, waveform)
    B, T, C = z.shape
    Tc = T - n_predicts  # contexts with a full prediction window

    # negatives: uniform over all (B*T) encodings (CPC_audio 'samespeaker'
    # batches are same-speaker, so batch-uniform matches its statistics)
    flat_z = z.reshape(B * T, C)
    neg_idx = jax.random.randint(rng, (B, Tc, n_negatives), 0, B * T)
    negs = flat_z[neg_idx]  # (B, Tc, N, C)

    losses = []
    accs = []
    preds = jnp.einsum("btc,kcd->kbtd", c[:, :Tc], head_params["W"])  # (K,B,Tc,C)
    for k in range(1, n_predicts + 1):
        pos = z[:, k : Tc + k]  # (B, Tc, C)
        p_k = preds[k - 1]
        pos_score = jnp.einsum("btc,btc->bt", p_k, pos)
        neg_score = jnp.einsum("btc,btnc->btn", p_k, negs)
        logits = jnp.concatenate([pos_score[..., None], neg_score], axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        losses.append(-logp[..., 0].mean())
        accs.append((logits.argmax(-1) == 0).mean())

    loss = jnp.stack(losses).mean()
    return loss, {
        "cpc_loss": loss,
        "cpc_acc": jnp.stack(accs).mean(),
        "cpc_acc_k1": accs[0],
        "cpc_acc_k12": accs[-1],
    }


class CpcTrainState(NamedTuple):
    encoder: Params
    heads: Params
    opt_state: Any
    step: jax.Array


def make_cpc_optimizer(learning_rate: float = 2e-4):
    """Adam with CPC_audio defaults (encoder_components.py:227-260)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def init_cpc_train_state(encoder_params: Params, head_params: Params, tx) -> CpcTrainState:
    return CpcTrainState(
        encoder=encoder_params,
        heads=head_params,
        opt_state=tx.init((encoder_params, head_params)),
        step=jnp.zeros((), jnp.int32),
    )


def make_cpc_train_step(tx, n_predicts: int = 12, n_negatives: int = 128):
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: CpcTrainState, waveform: jax.Array, rng: jax.Array):
        def loss_fn(both):
            enc, heads = both
            return cpc_loss(enc, heads, waveform, rng, n_predicts, n_negatives)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.encoder, state.heads)
        )
        updates, opt_state = tx.update(grads, state.opt_state, (state.encoder, state.heads))
        enc, heads = optax.apply_updates((state.encoder, state.heads), updates)
        return CpcTrainState(enc, heads, opt_state, state.step + 1), aux

    return step
