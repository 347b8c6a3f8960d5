"""voiceactivityprojection_tpu — TPU-native Voice Activity Projection framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ErikEkstedt/VoiceActivityProjection (reference mounted at /root/reference),
designed TPU-first:

* functional core: ``apply(params, waveform) -> {"logits", "vad"}``
* static shapes everywhere, `lax.scan`/`lax.associative_scan` for recurrence
* Pallas flash-attention kernel with ALiBi bias for the O(T^2) hot path
* `jax.sharding.Mesh` + `jax.jit`(sharding) data parallelism with psum over ICI

Public entry points mirror the reference's layer map (SURVEY.md §1):

    from voiceactivityprojection_tpu import VapConfig, VapModel
    model = VapModel.init(jax.random.key(0), VapConfig())
    out = model.forward(waveform)          # {"logits": (B,T,256), "vad": (B,T,2)}
    out = model.probs(waveform)            # p_now / p_future / H / probs / vad
"""

from voiceactivityprojection_tpu.config import (
    VapConfig,
    VapMonoConfig,
    OptConfig,
    DataConfig,
    EventConfig,
    SDSConfig,
)

__version__ = "0.1.0"


def __getattr__(name):
    # lazy model imports keep `import voiceactivityprojection_tpu` light
    if name in ("VapModel", "VapMonoModel"):
        from voiceactivityprojection_tpu.models import vap as _vap

        return getattr(_vap, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "VapConfig",
    "VapMonoConfig",
    "OptConfig",
    "DataConfig",
    "EventConfig",
    "SDSConfig",
    "VapModel",
    "VapMonoModel",
]
