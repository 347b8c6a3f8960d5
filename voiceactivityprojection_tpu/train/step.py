"""Training/eval steps: multitask loss, AdamW with frozen-encoder masking,
plateau-adjustable learning rate.

Semantics from the reference (vap/train.py:360-403, 378-395):
  labels = objective.get_labels(batch.vad)   # 256-way projection indices
  out    = forward(batch.waveform)
  loss   = CE(logits, labels) + BCE(vad_logits, vad)
  AdamW(lr 3.63e-4, wd 1e-3 on ALL params), ReduceLROnPlateau on val_loss.

TPU design: the step is a pure jitted function; with batches sharded over
the mesh's "data" axis and params replicated, XLA's sharding propagation
inserts the gradient all-reduce (psum over ICI) — no explicit pmap/NCCL.
The plateau schedule mutates `opt_state.hyperparams["learning_rate"]`
host-side between epochs (optax.inject_hyperparams), mirroring Lightning's
epoch-level ReduceLROnPlateau without rebuilding optimizer state.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from voiceactivityprojection_tpu.config import OptConfig, VapConfig
from voiceactivityprojection_tpu.models.vap import forward
from voiceactivityprojection_tpu.ops.codebook import get_labels
from voiceactivityprojection_tpu.ops.losses import loss_vad, loss_vap

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def make_optimizer(opt_conf: OptConfig, freeze_encoder: bool = True):
    """AdamW over all params (weight decay unmasked, like torch AdamW on
    `self.parameters()`); the pretrained CPC subtrees (gEncoder conv stack
    + gAR GRU) frozen via set_to_zero when freeze_encoder. The learned
    DOWNSAMPLE always trains: the reference's EncoderCPC.freeze() flips
    requires_grad only on `self.encoder` (vap/encoder.py:39-42) — the
    downsample conv (vap/encoder.py:23-31) is a sibling module and is the
    piece that adapts frozen CPC features to the task.

    The ALiBi slope leaves ("m") are ALWAYS frozen: the reference stores
    them as `requires_grad=False` parameters (modules.py:116-121), which
    torch AdamW skips entirely (no update, no weight decay)."""

    @optax.inject_hyperparams
    def make(learning_rate):
        adamw = optax.adamw(
            learning_rate,
            b1=opt_conf.betas[0],
            b2=opt_conf.betas[1],
            weight_decay=opt_conf.weight_decay,
        )

        def labels(params):
            def label(path, _):
                if (
                    freeze_encoder
                    and getattr(path[0], "key", None) == "encoder"
                    and getattr(path[1], "key", None) in ("gEncoder", "gAR")
                ):
                    return "freeze"
                if getattr(path[-1], "key", None) == "m":
                    return "freeze"  # non-trainable ALiBi slopes
                return "train"

            return jax.tree_util.tree_map_with_path(label, params)

        return optax.multi_transform(
            {"train": adamw, "freeze": optax.set_to_zero()}, labels
        )

    return make(learning_rate=opt_conf.learning_rate)


def init_train_state(params: Params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def _vap_loss_for_representation(conf: VapConfig, logits, vad):
    if conf.representation == "discrete":
        return loss_vap(logits, get_labels(vad, conf.bin_frames))
    from voiceactivityprojection_tpu.ops import objective_variants as ov

    if conf.representation == "independent":
        return ov.loss_vap_independent(
            logits, ov.get_labels_independent(vad, conf.bin_frames)
        )
    if conf.representation == "comparative":
        return ov.loss_vap_comparative(
            logits, ov.get_labels_comparative(vad, conf.bin_frames)
        )
    raise ValueError(conf.representation)


def loss_fn(
    params: Params,
    batch: Dict[str, jax.Array],
    conf: VapConfig,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Multitask loss (vap/train.py:397-403); VAP term dispatches on the
    objective representation."""
    out = forward(params, batch["waveform"], conf, rng=rng)
    lvap = _vap_loss_for_representation(conf, out["logits"], batch["vad"])
    lvad = loss_vad(out["vad"], batch["vad"])
    return lvap + lvad, {"vap_loss": lvap, "vad_loss": lvad}


def make_train_step(conf: VapConfig, tx):
    """Returns a jitted (state, batch, rng) -> (state, metrics) step."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, conf, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **aux}
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_train_step_augmented(conf, tx, *, mono: bool = False, **aug_kw):
    """Fused augment+train step: ONE jitted dispatch per training step.

    Folds the per-step PRNG derivation (fold_in on state.step), the
    device-side batch mutations (flip / vad-mask / noise / freq-mask,
    train/augment.py augment_on_device), the loss/grad and the optimizer
    update into a single executable. Motivation (measured on the v5e
    tunnel, B=16 f32): per-step host-side key splits + separate
    augment/step dispatches on freshly-uploaded batches ran at ~900
    ms/step vs 75 ms for the same math on resident arrays — dispatch
    latency and transfer serialization dominate, so the loop keeps
    exactly one host->device put (pipelined one step ahead, see
    train/loop.py) and one dispatch.

    `choice` selects the noise/freq-mask branch (0 none, 1 noise, 2
    freq-mask, 3 both; host-side pitch is applied before the put) and is
    a traced scalar — all branches live in the one executable.
    """
    from voiceactivityprojection_tpu.train.augment import augment_on_device

    lf = loss_fn_mono if mono else loss_fn

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState,
        batch: Dict[str, jax.Array],
        base_key: jax.Array,
        choice: jax.Array,
    ):
        k = jax.random.fold_in(base_key, state.step)
        k1, k3 = jax.random.split(k)
        batch = augment_on_device(batch, k1, choice, **aug_kw)
        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params, batch, conf, k3
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **aux}
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def loss_fn_mono(
    params: Params,
    batch: Dict[str, jax.Array],
    conf,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Mono multitask loss (reference train_mono.py shared_step: VAP CE only,
    VAD is an input condition, not a target). When the loader supplies the
    vad-history feature (batch["vah"], the reference external DataModule's
    vad_history, vap/train_mono.py:156-163) it conditions the forward."""
    from voiceactivityprojection_tpu.models.vap import forward_mono

    labels = get_labels(batch["vad"], conf.bin_frames)
    out = forward_mono(
        params, batch["waveform"], batch["vad"], conf,
        va_history=batch.get("vah"), rng=rng,
    )
    lvap = loss_vap(out["logits"], labels)
    return lvap, {"vap_loss": lvap, "vad_loss": jnp.zeros(())}


def make_train_step_mono(conf, tx):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn_mono, has_aux=True)(
            state.params, batch, conf, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss, **aux}

    return train_step


def make_eval_step(conf: VapConfig):
    """Jitted eval: losses + logits (events/metrics run host-side on these)."""

    @jax.jit
    def eval_step(params: Params, batch: Dict[str, jax.Array]):
        labels = get_labels(batch["vad"], conf.bin_frames)
        out = forward(params, batch["waveform"], conf)
        lvap = loss_vap(out["logits"], labels)
        lvad = loss_vad(out["vad"], batch["vad"])
        return {
            "vap_loss": lvap,
            "vad_loss": lvad,
            "logits": out["logits"],
            "vad_logits": out["vad"],
        }

    return eval_step


def make_eval_step_mono(conf):
    from voiceactivityprojection_tpu.models.vap import forward_mono

    @jax.jit
    def eval_step(params: Params, batch: Dict[str, jax.Array]):
        labels = get_labels(batch["vad"], conf.bin_frames)
        out = forward_mono(
            params, batch["waveform"], batch["vad"], conf,
            va_history=batch.get("vah"),
        )
        lvap = loss_vap(out["logits"], labels)
        return {
            "vap_loss": lvap,
            "vad_loss": jnp.zeros(()),
            "logits": out["logits"],
            "vad_logits": out["vad"],
        }

    return eval_step


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side LR mutation for ReduceLROnPlateau (epoch granularity)."""
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    opt_state = state.opt_state._replace(hyperparams=hp)
    return state._replace(opt_state=opt_state)


class ReduceLROnPlateau:
    """Host-side plateau schedule (torch semantics: factor, patience, min mode)."""

    def __init__(self, factor: float = 0.5, patience: int = 2, mode: str = "min"):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def update(self, state: TrainState, value: float) -> TrainState:
        improved = self.best is None or (
            value < self.best if self.mode == "min" else value > self.best
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
            return state
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return set_learning_rate(state, get_learning_rate(state) * self.factor)
        return state


class EarlyStopping:
    """Host-side early stop (vap/train.py:193-199 semantics)."""

    def __init__(self, patience: int = 10, mode: str = "min"):
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        improved = self.best is None or (
            value < self.best if self.mode == "min" else value > self.best
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs >= self.patience
