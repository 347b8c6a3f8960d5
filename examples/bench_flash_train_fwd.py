"""Decompose and A/B the flash-TRAIN attention forward at the training
parity shape (B=16, H=4, T=1000, Dh=64, bf16).

The r4 deep profile (examples/profile_train_step.py --deep) showed the
train step's top stall is the FORWARD: the train kernel costs ~1.52
ms/site vs ~0.8 for the inference kernel, x14 sites/step. Suspects:
  (a) the per-element lowbias32 dropout hash (rate 0.1 vs 0.0 isolates it
      — the `if rate > 0` branch compiles out entirely at 0.0);
  (b) full-plane compute at 1024 blocks: smaller blocks causally SKIP
      masked block pairs (512 -> 25% of pairs skipped, 256 -> 37.5%),
      which also skips their hash/exp work — the inference kernel
      measured 1024 fastest, but its per-element VPU work is far lower,
      so the balance may differ here.

Also re-times the fused vs split BACKWARD (bench_flash_bwd.py's A/B,
re-run here because its first attempt died on a tunnel stall).

Usage: python examples/bench_flash_train_fwd.py
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
from voiceactivityprojection_tpu.ops.flash_alibi import flash_alibi_attention
from voiceactivityprojection_tpu.ops.flash_alibi_train import (
    _flash_train_forward,
    flash_alibi_attention_train,
)


from _bench_util import timed as _timed


def timed(name, fn, iters=30, warmup=10):
    return _timed(name, fn, iters, warmup, width=44)


def main(B=16, H=4, T=1000, Dh=64):
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, T, Dh)).astype(np.float32) * 0.05,
        dtype=jnp.bfloat16,
    )
    q, k, v, cot = mk(), mk(), mk(), mk()
    slopes = alibi_slopes(H)
    seed = jnp.int32(7)
    scale = 1.0 / np.sqrt(H * Dh)

    # floor: the inference kernel (no dropout, no lse output)
    inf = jax.jit(lambda a, b, c: flash_alibi_attention(a, b, c, slopes, scale))
    timed("inference kernel (no dropout)", lambda: inf(q, k, v))

    # train forward variants
    ref_out = None
    for rate, bq, bk in (
        (0.0, 1024, 1024),
        (0.1, 1024, 1024),
        (0.1, 1024, 512),
        (0.1, 512, 512),
        (0.1, 1024, 256),
        (0.1, 256, 256),
    ):
        f = jax.jit(
            lambda a, b, c, rate=rate, bq=bq, bk=bk: _flash_train_forward(
                a, b, c, slopes, seed, scale, rate, block_q=bq, block_k=bk
            )[0]
        )
        timed(f"train fwd rate={rate} blocks={bq}/{bk}", lambda: f(q, k, v))
        if rate == 0.1:
            o = f(q, k, v)
            if ref_out is None:
                ref_out = o
            else:
                err = float(jnp.max(jnp.abs(
                    o.astype(jnp.float32) - ref_out.astype(jnp.float32))))
                assert err < 1e-2, f"blocking changed the output: {err}"

    # backward A/B (fused vs split), chained grad timing
    def make_grad():
        def loss(a, b, c):
            out = flash_alibi_attention_train(a, b, c, slopes, seed, scale, 0.1)
            return jnp.sum((out * cot).astype(jnp.float32))

        return jax.jit(lambda a, b, c: jax.grad(loss, argnums=(0, 1, 2))(a, b, c))

    for variant in ("fused", "split"):
        os.environ["VAP_FLASH_BWD"] = variant
        g = make_grad()
        timed(f"fwd+bwd VAP_FLASH_BWD={variant}", lambda: g(q, k, v))
    os.environ.pop("VAP_FLASH_BWD", None)


if __name__ == "__main__":
    main()
