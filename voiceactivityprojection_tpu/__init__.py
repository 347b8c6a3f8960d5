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

import os as _os

if _os.environ.get("VAP_PLATFORM"):
    # honor the documented platform override for LIBRARY users too (the
    # CLIs route through utils.runtime.setup_runtime; a plain import must
    # not leave the process pinned to an unreachable accelerator). Pure
    # config update — no computation happens at import.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VAP_PLATFORM"])

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
