"""A/B the TRAIN-step transformer section: twin pass vs channel-stacked.

Round-1 measured the channel-stacked stereo stack SLOWER at B=64 and
tied at B=1/8 for INFERENCE (apply_gpt_stereo_batched docstring). The r4
deep profile adds a reason to re-test at the TRAINING batch (B=16): the
flash-train attention site costs 1.52 ms at bh=64 but only 2.02 ms at
bh=128 — sublinear, i.e. shallow grids leave pipelining slack that
batching twin sites (same weights on [x1; x2]) could reclaim, forward
AND backward.

Times value_and_grad of the transformer+heads+loss section from
precomputed encoder features at B=16/32, twin vs batched.

Usage: python examples/bench_batched_train.py
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

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.transformer import (
    apply_gpt,
    apply_gpt_stereo,
    apply_gpt_stereo_batched,
)
from voiceactivityprojection_tpu.models.vap import init_vap
from voiceactivityprojection_tpu.ops.codebook import get_labels
from voiceactivityprojection_tpu.ops.losses import loss_vad, loss_vap


from _bench_util import timed as _timed


def timed(name, fn, iters=30, warmup=10):
    return _timed(name, fn, iters, warmup, width=40)


def heads_loss(tp, out, vad):
    v1 = out["x1"] @ tp["va_classifier"]["w"].T + tp["va_classifier"]["b"]
    v2 = out["x2"] @ tp["va_classifier"]["w"].T + tp["va_classifier"]["b"]
    vlog = jnp.concatenate([v1, v2], axis=-1).astype(jnp.float32)
    logits = (out["x"] @ tp["vap_head"]["w"].T + tp["vap_head"]["b"]).astype(
        jnp.float32
    )
    return loss_vap(logits, get_labels(vad, (10, 20, 30, 40))) + loss_vad(
        vlog, vad
    )


def main():
    conf = VapConfig(dtype="bfloat16")
    params = init_vap(jax.random.key(0), conf)
    cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
    tp = {
        k: jax.tree.map(cast, params[k])
        for k in ("ar_channel", "ar", "va_classifier", "vap_head")
    }
    for B in (16, 32):
        rng = np.random.default_rng(0)
        T = 1000
        x1, x2 = (
            jnp.asarray(
                rng.normal(size=(B, T, conf.dim)).astype(np.float32) * 0.1,
                dtype=jnp.bfloat16,
            )
            for _ in range(2)
        )
        vad = jnp.asarray(
            (rng.random((B, T + 100, 2)) < 0.4).astype(np.float32)
        )
        key = jax.device_put(jax.random.key(1))
        drop = conf.dropout

        def twin(tp, x1, x2, vad, k):
            r = jax.random.split(k, 3)
            o1 = apply_gpt(tp["ar_channel"], x1, num_heads=conf.num_heads,
                           dropout=drop, rng=r[0])["x"]
            o2 = apply_gpt(tp["ar_channel"], x2, num_heads=conf.num_heads,
                           dropout=drop, rng=r[1])["x"]
            out = apply_gpt_stereo(tp["ar"], o1, o2, num_heads=conf.num_heads,
                                   dropout=drop, rng=r[2])
            return heads_loss(tp, out, vad)

        def batched(tp, x1, x2, vad, k):
            r = jax.random.split(k, 2)
            z = jnp.concatenate([x1, x2], axis=0)
            o = apply_gpt(tp["ar_channel"], z, num_heads=conf.num_heads,
                          dropout=drop, rng=r[0])["x"]
            out = apply_gpt_stereo_batched(
                tp["ar"], o, num_heads=conf.num_heads, dropout=drop, rng=r[1]
            )
            return heads_loss(tp, out, vad)

        for name, fn in (("twin", twin), ("batched", batched)):
            f = jax.jit(fn)
            g = jax.jit(lambda tp, a, b, v, k, fn=fn: jax.value_and_grad(fn)(
                tp, a, b, v, k))
            timed(f"B={B} tf fwd {name}", lambda: f(tp, x1, x2, vad, key))
            timed(f"B={B} tf fwd+bwd {name}", lambda: g(tp, x1, x2, vad, key))


if __name__ == "__main__":
    main()
