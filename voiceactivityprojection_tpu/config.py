"""Typed configuration system.

The reference hand-rolls the same dataclass+argparse pattern five times
(reference: vap/model.py:42-122, vap/train.py:32-96, vap/events.py:21-62,
sds/run_sds.py:31-47). Here a single generic helper provides
``add_argparse_args`` / ``args_to_conf`` for every config, and configs are
frozen so they can be used as static (hashable) arguments under ``jax.jit``.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import List, Tuple


BIN_TIMES: Tuple[float, ...] = (0.2, 0.4, 0.6, 0.8)


def _add_argparse_args(cls, parser: argparse.ArgumentParser, prefix: str):
    for name, f in cls.__dataclass_fields__.items():
        arg = f"--{prefix}_{name}"
        if f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            default = f.default_factory()  # type: ignore[misc]
        else:
            default = f.default
        if isinstance(default, (tuple, list)):
            elem_t = type(default[0]) if len(default) else float
            parser.add_argument(arg, nargs="+", type=elem_t, default=list(default))
        elif isinstance(default, bool):
            parser.add_argument(arg, type=int, default=int(default))
        else:
            parser.add_argument(arg, type=type(default), default=default)
    return parser


def _args_to_conf(cls, args: argparse.Namespace, prefix: str):
    fields = cls.__dataclass_fields__
    kwargs = {}
    p = prefix + "_"
    for k, v in vars(args).items():
        if not k.startswith(p):
            continue
        name = k[len(p):]
        if name not in fields:
            continue
        default = fields[name].default
        if isinstance(v, list):
            v = tuple(v)
        elif isinstance(default, bool):
            v = bool(v)
        kwargs[name] = v
    return cls(**kwargs)


class ArgparseMixin:
    """Generic CLI binding: ``--<prefix>_<field>`` for every dataclass field."""

    PREFIX = ""

    @classmethod
    def add_argparse_args(cls, parser: argparse.ArgumentParser):
        return _add_argparse_args(cls, parser, cls.PREFIX)

    @classmethod
    def args_to_conf(cls, args: argparse.Namespace):
        return _args_to_conf(cls, args, cls.PREFIX)


@dataclass(frozen=True)
class VapConfig(ArgparseMixin):
    """Stereo VAP model config (reference: vap/model.py:42-79)."""

    PREFIX = "vap"

    sample_rate: int = 16_000
    frame_hz: int = 50
    bin_times: Tuple[float, ...] = BIN_TIMES

    # Encoder
    freeze_encoder: bool = True
    load_pretrained: bool = True

    # GPT
    dim: int = 256
    channel_layers: int = 1
    cross_layers: int = 3
    num_heads: int = 4
    dropout: float = 0.1

    # TPU-specific knobs (no reference equivalent)
    dtype: str = "float32"        # compute dtype for the transformer stack
    attn_impl: str = "auto"       # "auto" | "pallas" | "xla"

    # objective representation: "discrete" (256-way codebook, the reference
    # snapshot's objective), "independent" (per-bin Bernoulli, head dim 8),
    # or "comparative" (scalar A-share, head dim 1) — the Interspeech-2022
    # label-space family (reference tests/test_model_components.py:12-90)
    representation: str = "discrete"

    # CPC encoder architecture (fixed by the libri-light 60k checkpoint:
    # reference encoder_components.py:206-217 hiddenEncoder=hiddenGar=256)
    encoder_dim: int = 256

    def __post_init__(self):
        if isinstance(self.bin_times, list):
            object.__setattr__(self, "bin_times", tuple(self.bin_times))

    @property
    def bin_frames(self) -> List[int]:
        from voiceactivityprojection_tpu.utils.units import bin_times_to_frames

        return bin_times_to_frames(list(self.bin_times), self.frame_hz)

    @property
    def horizon_frames(self) -> int:
        return sum(self.bin_frames)

    @property
    def horizon_time(self) -> float:
        return sum(self.bin_times)

    @property
    def n_classes(self) -> int:
        return 2 ** (2 * len(self.bin_times))

    @property
    def head_dim(self) -> int:
        n_bins = len(self.bin_times)
        return {
            "discrete": self.n_classes,
            "independent": 2 * n_bins,
            "comparative": 1,
        }[self.representation]


@dataclass(frozen=True)
class VapMonoConfig(VapConfig):
    """Mono VAP model config (reference: vap/model.py:82-122)."""

    PREFIX = "vap"

    mono: bool = True
    va_history: bool = False
    va_history_bins: int = 5


@dataclass(frozen=True)
class OptConfig(ArgparseMixin):
    """Optimizer / schedule config (reference: vap/train.py:32-64)."""

    PREFIX = "opt"

    learning_rate: float = 3.63e-4
    find_learning_rate: bool = False
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.001
    lr_scheduler_interval: str = "step"
    lr_scheduler_freq: int = 100
    lr_scheduler_tmax: int = 2500
    lr_scheduler_patience: int = 2
    lr_scheduler_factor: float = 0.5

    # early stopping
    early_stopping: bool = True
    patience: int = 10
    monitor: str = "val_loss"
    mode: str = "min"


@dataclass(frozen=True)
class DataConfig(ArgparseMixin):
    """Data pipeline config (reference: vap/train.py:67-96).

    The reference's DataModule lives in an external private repo; the batch
    contract (reference README.md:35-42) is:
      batch["waveform"]: (B, 2, n_samples)  20 s @ 16 kHz -> 320_000
      batch["vad"]:      (B, n_frames + horizon_frames, 2)  -> 1100 @ 50 Hz
    """

    PREFIX = "data"

    train_path: str = ""
    val_path: str = ""
    test_path: str = ""
    flip_channels: bool = True
    flip_probability: float = 0.5
    mask_vad: bool = False
    mask_vad_probability: float = 0.4
    # pitch-shift augmentation implementation:
    #   "vocoder"  (DEFAULT) — phase vocoder + resample ON DEVICE inside
    #              the fused train step (ops/pitchshift.py); the same
    #              algorithm as torchaudio's PitchShift, i.e. the
    #              reference's default semantics (vap/transforms.py:92-107):
    #              tempo/duration preserved, labels stay aligned.
    #   "psola"    — host-side TD-PSOLA (tempo-preserving; ~0.2 s per 20 s
    #              channel on host).
    #   "resample" — host-side resample-and-crop (fast but shifts tempo,
    #              de-aligning VAD labels; kept for comparison).
    pitch_mode: str = "vocoder"
    # mono model VAD-history conditioning (VapMonoConfig.va_history): the
    # loader derives batch["vah"] — per-frame speaker-0 activity ratio over
    # len(times)+1 trailing windows (ops/vad.py get_activity_history, the
    # reference external DataModule's vad_history feature,
    # vap/train_mono.py:156-163). len(times)+1 must equal va_history_bins.
    va_history_times: Tuple[float, ...] = (60.0, 30.0, 10.0, 5.0)
    # phrase-probe callback (reference PhrasesCallback runs at every
    # val/test epoch, vap/train.py:202 / vap/evaluation.py:298): -1 auto
    # (on when the corpus csv exists under phrases_root), 0 off, 1 required
    phrases_probe: int = -1
    phrases_root: str = "/root/reference"
    phrases_probe_limit: int = 0  # 0 = full 360-sample corpus
    # per-sample probability of the waveform-augmentation branch (pitch /
    # noise / freq-mask, reference transforms.py:58-70 weights); 0 turns
    # waveform augmentation off entirely (channel flip is separate) —
    # used e.g. by the phrases-prosody training run, where pitch-shift
    # augmentation would train away the F0 sensitivity being probed
    augment_probability: float = 0.5
    batch_size: int = 16
    num_workers: int = 2

    # derived contract values
    audio_duration: float = 20.0
    sample_rate: int = 16_000
    frame_hz: int = 50
    horizon_time: float = 2.0


@dataclass(frozen=True)
class EventConfig(ArgparseMixin):
    """Turn-taking event extraction config (reference: vap/events.py:21-62)."""

    PREFIX = "event"

    min_context_time: float = 3.0
    metric_time: float = 0.2
    metric_pad_time: float = 0.05
    max_time: float = 20.0
    frame_hz: int = 50
    equal_hold_shift: bool = True
    prediction_region_time: float = 0.5

    # Shift/Hold
    sh_pre_cond_time: float = 1.0
    sh_post_cond_time: float = 1.0
    sh_prediction_region_on_active: bool = True

    # Backchannel
    bc_pre_cond_time: float = 1.0
    bc_post_cond_time: float = 1.0
    bc_max_duration: float = 1.0
    bc_negative_pad_left_time: float = 1.0
    bc_negative_pad_right_time: float = 2.0

    # Long/Short
    long_onset_region_time: float = 0.2
    long_onset_condition_time: float = 1.0


@dataclass(frozen=True)
class SDSConfig(ArgparseMixin):
    """Real-time spoken-dialogue-system config (reference: sds/run_sds.py:31-47)."""

    PREFIX = "sds"

    sample_rate: int = 16_000
    frame_hz: int = 50
    context_time: float = 20.0
    chunk_time: float = 0.02
    zmq_port: int = 5578
    zmq_topic: str = "tt_probs"
    prob_smooth_time: float = 0.5
    audio_device: int = -1
    savefile: str = ""
    # "window": re-run the transformer over the context window per hop
    # (StreamingVap); "kv": per-layer K/V caches, O(1) transformer work per
    # frame (KVStreamingVap — exact vs the batch forward until the context
    # fills, then per-layer sliding-window attention)
    transformer_mode: str = "window"
