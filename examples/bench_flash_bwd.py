"""A/B the flash-train attention BACKWARD: fused single-block kernel
(ops/flash_alibi_train._bwd_fused_kernel — dQ/dK/dV in one pass, one
score/softmax/dP recompute) vs the split dQ + dKV kernel pair (two
recomputes), at the training parity shape (B=16, H=4, T=1000, Dh=64,
bf16, dropout 0.1) and at B=32.

The env knob VAP_FLASH_BWD is read at trace time, so each variant is
traced under its own setting (fresh jit per variant).

Usage: python examples/bench_flash_bwd.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.ops.attention import alibi_slopes
from voiceactivityprojection_tpu.ops.flash_alibi_train import (
    flash_alibi_attention_train,
)


from _bench_util import timed as _timed


def timed(name, fn, iters=30, warmup=10):
    return _timed(name, fn, iters, warmup, width=40)


def bench(B, H=4, T=1000, Dh=64, rate=0.1, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, T, Dh)).astype(np.float32) * 0.05, dtype=dtype
    )
    q, k, v, cot = mk(), mk(), mk(), mk()
    slopes = alibi_slopes(H)
    seed = jnp.int32(7)
    scale = 1.0 / np.sqrt(H * Dh)

    def make_grad():
        # fresh closure => fresh jit trace under the CURRENT env knob
        def loss(q, k, v):
            out = flash_alibi_attention_train(q, k, v, slopes, seed, scale, rate)
            return jnp.sum((out * cot).astype(jnp.float32))

        return jax.jit(lambda a, b, c: jax.grad(loss, argnums=(0, 1, 2))(a, b, c))

    results = {}
    for variant in ("fused", "split"):
        os.environ["VAP_FLASH_BWD"] = variant
        g = make_grad()
        results[variant] = timed(
            f"B={B} fwd+bwd VAP_FLASH_BWD={variant}", lambda: g(q, k, v)
        )
    # numerical agreement between the two variants
    os.environ["VAP_FLASH_BWD"] = "fused"
    gf = make_grad()(q, k, v)
    os.environ["VAP_FLASH_BWD"] = "split"
    gs = make_grad()(q, k, v)
    err = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        for a, b in zip(gf, gs)
    )
    print(f"B={B}: fused/split max |d| = {err:.2e}, "
          f"speedup {results['split'] / results['fused']:.2f}x", flush=True)
    os.environ.pop("VAP_FLASH_BWD", None)
    return results


if __name__ == "__main__":
    for B in (16, 32):
        bench(B)
