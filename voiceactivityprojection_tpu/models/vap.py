"""VAP model assembly: stereo (VapModel) and mono (VapMonoModel).

Architecture (reference: vap/model.py:125-268 stereo, 271-393 mono):

  stereo: shared CPC encoder applied per channel -> per-channel GPT
          (`ar_channel`, 1 layer) -> cross-channel GPTStereo (`ar`,
          3 layers) -> heads: va_classifier Linear(dim->1) on x1/x2,
          vap_head Linear(dim->256) on the combined x.
  mono:   single-channel encoder + VAD conditioning added to features
          (va_condition Linear(2->dim) [+ va_cond_history] -> LayerNorm),
          two plain GPT stacks, vap_head only.

The core is pure: ``forward(params, waveform, conf)``. The thin
``VapModel`` class carries (conf, params) and jit-compiled entry points;
training uses the pure functions directly under its own jit.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig, VapMonoConfig
from voiceactivityprojection_tpu.models.encoder import apply_encoder, init_encoder
from voiceactivityprojection_tpu.models.transformer import (
    apply_gpt,
    apply_gpt_stereo,
    init_gpt,
    init_gpt_stereo,
)
from voiceactivityprojection_tpu.ops.codebook import (
    entropy_bits,
    get_labels,
    probs_next_speaker_aggregate,
)
from voiceactivityprojection_tpu.ops.conv import init_norm, layer_norm
from voiceactivityprojection_tpu.ops.losses import loss_vap
from voiceactivityprojection_tpu.ops.vad import vad_fill_silences, vad_omit_spikes

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------
def init_vap(key: jax.Array, conf: VapConfig) -> Params:
    ks = jax.random.split(key, 6)
    dim = conf.dim
    params: Params = {
        "encoder": init_encoder(ks[0], conf.encoder_dim),
        "ar_channel": init_gpt(ks[1], dim, conf.channel_layers, conf.num_heads),
        "ar": init_gpt_stereo(ks[2], dim, conf.cross_layers, conf.num_heads),
        "va_classifier": {
            "w": 0.02 * jax.random.normal(ks[3], (1, dim)),
            "b": jnp.zeros((1,)),
        },
        "vap_head": {
            # head width follows the objective representation:
            # 256 discrete classes / 8 independent bins / 1 comparative scalar
            "w": 0.02 * jax.random.normal(ks[4], (conf.head_dim, dim)),
            "b": jnp.zeros((conf.head_dim,)),
        },
    }
    return params


def init_vap_mono(key: jax.Array, conf: VapMonoConfig) -> Params:
    ks = jax.random.split(key, 8)
    dim = conf.dim
    # orthogonal init for va_condition (vap/model.py:308-311)
    w_cond = jax.nn.initializers.orthogonal()(ks[5], (dim, 2))
    params: Params = {
        "encoder": init_encoder(ks[0], conf.encoder_dim),
        "ar_channel": init_gpt(ks[1], dim, conf.channel_layers, conf.num_heads),
        "ar": init_gpt(ks[2], dim, conf.cross_layers, conf.num_heads),
        "va_condition": {"w": w_cond, "b": jnp.zeros((dim,))},
        "va_cond_ln": init_norm(dim),
        "vap_head": {
            "w": 0.02 * jax.random.normal(ks[4], (conf.n_classes, dim)),
            "b": jnp.zeros((conf.n_classes,)),
        },
    }
    if conf.va_history:
        params["va_cond_history"] = {
            "w": 0.02 * jax.random.normal(ks[6], (dim, conf.va_history_bins)),
            "b": jnp.zeros((dim,)),
        }
    return params


# --------------------------------------------------------------------------
# forward (pure)
# --------------------------------------------------------------------------
def encode_audio(
    params: Params,
    waveform: jax.Array,
    fused_auto: bool = False,
    fuse_downsample: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """(B, 2, n_samples) -> per-channel (B, T, C) features; shared encoder
    weights applied to each channel separately (vap/model.py:169-175)."""
    assert waveform.ndim == 3 and waveform.shape[1] == 2, (
        f"expected (B, 2, n_samples), got {waveform.shape}"
    )
    # stack channels into the batch dim: one encoder pass, twice the batch —
    # better MXU utilization than two sequential calls
    B = waveform.shape[0]
    both = waveform.reshape(B * 2, waveform.shape[-1])
    z = apply_encoder(
        params["encoder"], both,
        fused_auto=fused_auto, fuse_downsample=fuse_downsample,
    )
    z = z.reshape(B, 2, *z.shape[1:])
    return z[:, 0], z[:, 1]


def _compute_cast(params: Params, waveform: jax.Array, conf: VapConfig):
    """Mixed precision: params/activations in conf.dtype (norm statistics,
    attention softmax, and head outputs stay float32)."""
    if conf.dtype == "bfloat16":
        cast = lambda x: (
            x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
        )
        return jax.tree.map(cast, params), waveform.astype(jnp.bfloat16)
    return params, waveform


def forward(
    params: Params,
    waveform: jax.Array,
    conf: VapConfig,
    rng: Optional[jax.Array] = None,
    attention: bool = False,
) -> Dict[str, jax.Array]:
    """Stereo forward: waveform (B, 2, n) -> {"logits": (B, T, 256),
    "vad": (B, T, 2)} (vap/model.py:249-268). Outputs are float32 even in
    bfloat16 compute mode."""
    drop = conf.dropout if rng is not None else 0.0
    r = jax.random.split(rng, 3) if rng is not None else (None, None, None)

    params, waveform = _compute_cast(params, waveform, conf)
    # fused conv stack auto-fires for inference (rng None) and for frozen-
    # encoder training (the stop_gradient on the encoder PARAMS below
    # zeroes their tangents, so the fused kernels are never differentiated
    # — they have no JVP rule). Measured on v5e: pure forward 71.0 vs
    # 75.6 ms (B=64x20s) and train step 62.0 vs 64.5 ms (B=16) since the
    # window expand moved in-kernel; with an UNFROZEN encoder the custom
    # VJP would recompute the XLA forward, so that case keeps XLA convs.
    if conf.freeze_encoder:
        # frozen CPC (vap/encoder.py:39-42 — EncoderCPC.freeze() flips
        # requires_grad only on self.encoder = gEncoder conv stack + gAR
        # GRU; the learned DOWNSAMPLE is a sibling and keeps training):
        # stop gradients at those PARAMS, not the features — under
        # jax.grad the params carry tangents into apply_encoder otherwise,
        # which (a) wastes an encoder backward and (b) asserts in the
        # Pallas fused kernels (no JVP rule). With gEncoder/gAR stopped
        # and the waveform constant, nothing upstream of the downsample
        # carries tangents, so the conv/GRU backward is never built while
        # the downsample's is. The optimizer mask matches (train/step.py).
        params = dict(params)
        enc = dict(params["encoder"])
        for sub in ("gEncoder", "gAR"):
            enc[sub] = jax.tree.map(jax.lax.stop_gradient, enc[sub])
        params["encoder"] = enc
    x1, x2 = encode_audio(
        params,
        waveform,
        fused_auto=rng is None or bool(conf.freeze_encoder),
        # the GRU+downsample epilogue kernel has no VJP: inference only
        fuse_downsample=rng is None,
    )
    # NOTE: the channel-stacked variant (apply_gpt_stereo_batched — one
    # 2B-sized dispatch per layer instead of two B-sized twin passes) was
    # measured SLOWER or tied on v5e at every batch (B=64: 42.2 vs 33.8 ms
    # stereo stack; B=1/8: tie) — the independent twin chains give XLA's
    # scheduler cross-chain ILP to hide HBM latency. Twin pass stays.
    o1 = apply_gpt(
        params["ar_channel"], x1, num_heads=conf.num_heads,
        dropout=drop, rng=r[0], attn_impl=conf.attn_impl, attention_out=attention,
    )
    o2 = apply_gpt(
        params["ar_channel"], x2, num_heads=conf.num_heads,
        dropout=drop, rng=r[1], attn_impl=conf.attn_impl, attention_out=attention,
    )
    out = apply_gpt_stereo(
        params["ar"], o1["x"], o2["x"], num_heads=conf.num_heads,
        dropout=drop, rng=r[2], attn_impl=conf.attn_impl, attention_out=attention,
    )

    v1 = out["x1"] @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    v2 = out["x2"] @ params["va_classifier"]["w"].T + params["va_classifier"]["b"]
    vad = jnp.concatenate([v1, v2], axis=-1)
    logits = out["x"] @ params["vap_head"]["w"].T + params["vap_head"]["b"]
    # outputs in at least f32 (bf16 compute upcasts; f64 parity runs keep f64)
    vad = vad.astype(jnp.promote_types(vad.dtype, jnp.float32))
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))

    ret = {"logits": logits, "vad": vad}
    if attention:
        ret["self_attn"] = jnp.stack([o1["attn"], o2["attn"]], axis=1)
        ret["cross_attn"] = out["cross_attn"]
        ret["cross_self_attn"] = out["self_attn"]
    return ret


def forward_mono(
    params: Params,
    waveform: jax.Array,
    va: jax.Array,
    conf: VapMonoConfig,
    va_history: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Mono forward with VAD conditioning (vap/model.py:367-393)."""
    drop = conf.dropout if rng is not None else 0.0
    r = jax.random.split(rng, 2) if rng is not None else (None, None)

    if waveform.ndim == 3:
        assert waveform.shape[1] == 1, f"expected (B, 1, n), got {waveform.shape}"
        waveform = waveform[:, 0]
    params, waveform = _compute_cast(params, waveform, conf)
    # see forward(): params-level stop on the CPC subtrees only keeps
    # tangents out of the Pallas fused encoder kernels (no JVP rule)
    # under jax.grad while the learned downsample keeps training
    # (reference EncoderCPC.freeze() scope, vap/encoder.py:39-42)
    enc_params = params["encoder"]
    if conf.freeze_encoder:
        enc_params = dict(enc_params)
        for sub in ("gEncoder", "gAR"):
            enc_params[sub] = jax.tree.map(
                jax.lax.stop_gradient, enc_params[sub]
            )
    x = apply_encoder(
        enc_params,
        waveform,
        fused_auto=rng is None or bool(conf.freeze_encoder),
        fuse_downsample=rng is None,
    )

    # VAD conditioning (vap/model.py:354-359); va stays float32 (it is a
    # binary mask), the conditioning joins the features in compute dtype
    cond = va @ params["va_condition"]["w"].T + params["va_condition"]["b"]
    if conf.va_history and va_history is not None and "va_cond_history" in params:
        cond = cond + (
            va_history @ params["va_cond_history"]["w"].T
            + params["va_cond_history"]["b"]
        )
    cond = layer_norm(cond, params["va_cond_ln"]["w"], params["va_cond_ln"]["b"])
    n = min(x.shape[1], cond.shape[1])
    x = x[:, :n] + cond[:, :n].astype(x.dtype)

    x = apply_gpt(
        params["ar_channel"], x, num_heads=conf.num_heads,
        dropout=drop, rng=r[0], attn_impl=conf.attn_impl,
    )["x"]
    x = apply_gpt(
        params["ar"], x, num_heads=conf.num_heads,
        dropout=drop, rng=r[1], attn_impl=conf.attn_impl,
    )["x"]

    logits = x @ params["vap_head"]["w"].T + params["vap_head"]["b"]
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    return {"logits": logits, "vad": va}


# --------------------------------------------------------------------------
# derived outputs (pure)
# --------------------------------------------------------------------------
def probs_from_logits(
    logits: jax.Array,
    vad_logits: jax.Array,
    conf: VapConfig,
    vad: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """softmax + entropy + p_now/p_future [+ per-frame loss when labels are
    derivable from vad] (vap/model.py:180-225). Dispatches on the objective
    representation (discrete / independent / comparative).

    Deliberate deviation: the reference shadows its ground-truth `vad`
    argument with the model's own sigmoid VAD (vap/model.py:190), so its
    "loss" key is always present and always measured against PREDICTED
    activity. Here the loss appears only when real labels are supplied and
    is measured against them — the clearly intended semantics."""
    if conf.representation == "discrete":
        probs = jax.nn.softmax(logits, axis=-1)
        ret = {
            "probs": probs,
            "vad": jax.nn.sigmoid(vad_logits),
            "p_now": probs_next_speaker_aggregate(probs, 0, 1),
            "p_future": probs_next_speaker_aggregate(probs, 2, 3),
            "H": entropy_bits(probs),
        }
        if vad is not None:
            labels = get_labels(vad, conf.bin_frames)
            ret["loss"] = loss_vap(logits, labels, reduction="none")
        return ret

    from voiceactivityprojection_tpu.ops import objective_variants as ov

    if conf.representation == "independent":
        bin_probs = jax.nn.sigmoid(logits)
        # per-bin Bernoulli entropy summed over bins (bits)
        h = -(
            bin_probs * jnp.log2(jnp.clip(bin_probs, 1e-9, 1.0))
            + (1 - bin_probs) * jnp.log2(jnp.clip(1 - bin_probs, 1e-9, 1.0))
        ).sum(-1)
        ret = {
            "probs": bin_probs,
            "vad": jax.nn.sigmoid(vad_logits),
            "p_now": ov.probs_independent(logits, conf.bin_frames, 0, 1),
            "p_future": ov.probs_independent(logits, conf.bin_frames, 2, 3),
            "H": h,
        }
        if vad is not None:
            labels = ov.get_labels_independent(vad, conf.bin_frames)
            ret["loss"] = ov.loss_vap_independent(logits, labels, reduction="none")
        return ret

    if conf.representation == "comparative":
        p = jax.nn.sigmoid(logits[..., 0])
        h = -(
            p * jnp.log2(jnp.clip(p, 1e-9, 1.0))
            + (1 - p) * jnp.log2(jnp.clip(1 - p, 1e-9, 1.0))
        )
        pn = jnp.stack([p, 1.0 - p], axis=-1)
        ret = {
            "probs": p[..., None],
            "vad": jax.nn.sigmoid(vad_logits),
            "p_now": pn,
            "p_future": pn,
            "H": h,
        }
        if vad is not None:
            labels = ov.get_labels_comparative(vad, conf.bin_frames)
            ret["loss"] = ov.loss_vap_comparative(logits, labels, reduction="none")
        return ret

    raise ValueError(f"unknown representation {conf.representation!r}")


@partial(jax.jit, static_argnames=("conf",))
def _probs_jit(params, waveform, conf):
    out = forward(params, waveform, conf)
    return probs_from_logits(out["logits"], out["vad"], conf)


@partial(jax.jit, static_argnames=("conf",))
def _probs_with_vad_jit(params, waveform, vad, conf):
    out = forward(params, waveform, conf)
    return probs_from_logits(out["logits"], out["vad"], conf, vad=vad)


@partial(jax.jit, static_argnames=("conf",))
def _forward_jit(params, waveform, conf):
    return forward(params, waveform, conf)


@partial(
    jax.jit,
    static_argnames=("conf", "max_fill_silence_time", "max_omit_spike_time", "vad_cutoff"),
)
def _vad_jit(params, waveform, conf, max_fill_silence_time, max_omit_spike_time, vad_cutoff):
    out = forward(params, waveform, conf)
    v = (jax.nn.sigmoid(out["vad"]) >= vad_cutoff).astype(jnp.float32)
    v = vad_fill_silences(v, max_fill_silence_time, conf.frame_hz)
    v = vad_omit_spikes(v, max_omit_spike_time, conf.frame_hz)
    return v


# --------------------------------------------------------------------------
# model classes
# --------------------------------------------------------------------------
class VapModel:
    """Stereo VAP model: (conf, params) + jitted inference entry points."""

    def __init__(self, conf: VapConfig, params: Params):
        self.conf = conf
        self.params = params

    @classmethod
    def init(cls, key: jax.Array, conf: Optional[VapConfig] = None) -> "VapModel":
        conf = conf or VapConfig()
        return cls(conf, init_vap(key, conf))

    @classmethod
    def from_torch_state_dict(
        cls, path: str, conf: Optional[VapConfig] = None
    ) -> "VapModel":
        from voiceactivityprojection_tpu.models.checkpoint import (
            load_torch_state_dict,
            import_vap_state_dict,
        )

        conf = conf or VapConfig()
        sd = load_torch_state_dict(path)
        return cls(conf, import_vap_state_dict(sd, conf))

    @classmethod
    def from_args(cls, args, key: Optional[jax.Array] = None) -> "VapModel":
        """Build from the standard CLI argparse namespace: --vap_* config
        plus optional --state_dict (torch import) / --checkpoint (orbax).
        Shared by the analysis/eval CLIs so checkpoint-loading precedence
        lives in one place."""
        conf = VapConfig.args_to_conf(args)
        if getattr(args, "state_dict", ""):
            return cls.from_torch_state_dict(args.state_dict, conf)
        model = cls(conf, init_vap(key if key is not None else jax.random.key(0), conf))
        if getattr(args, "checkpoint", ""):
            import os

            from voiceactivityprojection_tpu.models.checkpoint import (
                restore_checkpoint,
            )

            model.params = restore_checkpoint(
                os.path.abspath(args.checkpoint), {"params": model.params}
            )["params"]
        return model

    @property
    def sample_rate(self) -> int:
        return self.conf.sample_rate

    @property
    def frame_hz(self) -> int:
        return self.conf.frame_hz

    @property
    def horizon_time(self) -> float:
        return self.conf.horizon_time

    def forward(self, waveform, attention: bool = False) -> Dict[str, jax.Array]:
        if attention:  # weights output path is not jitted (analysis only)
            return forward(self.params, jnp.asarray(waveform), self.conf, attention=True)
        return _forward_jit(self.params, jnp.asarray(waveform), self.conf)

    __call__ = forward

    def probs(self, waveform, vad=None) -> Dict[str, jax.Array]:
        waveform = jnp.asarray(waveform)
        if vad is None:
            return _probs_jit(self.params, waveform, self.conf)
        return _probs_with_vad_jit(self.params, waveform, jnp.asarray(vad), self.conf)

    def vad(
        self,
        waveform,
        max_fill_silence_time: float = 0.02,
        max_omit_spike_time: float = 0.02,
        vad_cutoff: float = 0.5,
    ) -> jax.Array:
        return _vad_jit(
            self.params,
            jnp.asarray(waveform),
            self.conf,
            max_fill_silence_time,
            max_omit_spike_time,
            vad_cutoff,
        )


_forward_mono_jit = partial(jax.jit, static_argnames=("conf",))(forward_mono)


@partial(jax.jit, static_argnames=("conf",))
def _mono_probs_jit(params, waveform, va, conf, va_history=None):
    out = forward_mono(params, waveform, va, conf, va_history=va_history)
    probs = jax.nn.softmax(out["logits"], axis=-1)
    return {
        "probs": probs,
        "vad": va,
        "p_now": probs_next_speaker_aggregate(probs, 0, 1),
        "p_future": probs_next_speaker_aggregate(probs, 2, 3),
        "H": entropy_bits(probs),
    }


class VapMonoModel:
    """Mono VAP model with VAD conditioning (vap/model.py:271-393)."""

    def __init__(self, conf: VapMonoConfig, params: Params):
        self.conf = conf
        self.params = params

    @classmethod
    def init(cls, key: jax.Array, conf: Optional[VapMonoConfig] = None) -> "VapMonoModel":
        conf = conf or VapMonoConfig()
        return cls(conf, init_vap_mono(key, conf))

    def forward(self, waveform, va, va_history=None) -> Dict[str, jax.Array]:
        if va_history is not None:
            va_history = jnp.asarray(va_history)
        return _forward_mono_jit(
            self.params, jnp.asarray(waveform), jnp.asarray(va), self.conf,
            va_history,
        )

    __call__ = forward

    def probs(self, waveform, va, va_history=None) -> Dict[str, jax.Array]:
        """Derived probabilities; `va_history` mirrors the reference's
        optional vad_history conditioning at inference
        (vap/phrases/evaluation_phrases.py:339-349)."""
        if va_history is not None:
            va_history = jnp.asarray(va_history)
        return _mono_probs_jit(
            self.params, jnp.asarray(waveform), jnp.asarray(va), self.conf,
            va_history,
        )
