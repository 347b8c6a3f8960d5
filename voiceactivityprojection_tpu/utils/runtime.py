"""Runtime setup: platform override + persistent compilation cache +
determinism (SURVEY.md §5.2 — the reference forces torch determinism in
vap/utils.py:52-103; JAX programs are deterministic by construction given
fixed PRNG keys, so `everything_deterministic` just pins XLA flags that
could introduce nondeterminism and seeds Python/NumPy)."""

from __future__ import annotations

import os
import random

import numpy as np
import jax

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/vap_tpu_xla")


def setup_runtime(
    platform: str | None = None,
    compilation_cache: bool = True,
    cache_dir: str = DEFAULT_CACHE_DIR,
) -> None:
    """Call before the first computation. Honors VAP_PLATFORM (this image's
    site hook pins JAX_PLATFORMS, so the env var is the only reliable
    override). The persistent compilation cache makes repeat runs skip the
    (minutes-long, when tunneled) XLA compile."""
    platform = platform or os.environ.get("VAP_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
        tag = platform
    else:
        # ask JAX which backend is ACTUALLY selected — the JAX_PLATFORMS
        # env var is inert under this image's site hook, so deriving the
        # tag from it could disable the cache while running on TPU
        tag = jax.default_backend()
    if compilation_cache and tag != "cpu":
        # TPU-only: compiles through the tunnel take minutes and cache well.
        # CPU compiles are fast AND the CPU AOT entries embed machine
        # features — loading them on a different host risks SIGILL.
        cache_dir = f"{cache_dir}-{tag.replace(',', '_')}"
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def everything_deterministic(seed: int = 0) -> None:
    """Seed host-side RNGs. Device-side randomness in this framework only
    flows through explicit jax.random keys (contract of vap/utils.py:52-103
    minus the CUDA-specific workarounds, which have no XLA analogue)."""
    random.seed(seed)
    np.random.seed(seed)
