"""Decompose the training step's 59.8 ms (B=16 bf16 frozen) into stages.

bench.py --train gives the end-to-end step time and MFU (17.0% on v5e);
this script splits it so optimization effort lands on the real stall:

  fwd        — loss forward only (no grad)
  grad       — jax.value_and_grad of the same loss (fwd + bwd)
  step       — the full fused augmented train step (grad + optimizer)
  aug        — augment_on_device alone (noise branch)

Every timing is chained-dispatch with a single host fetch (tunnel-safe).

Usage: python examples/profile_train_step.py [batch]
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

from voiceactivityprojection_tpu.config import OptConfig, VapConfig
from voiceactivityprojection_tpu.models.vap import init_vap
from voiceactivityprojection_tpu.train.augment import augment_on_device
from voiceactivityprojection_tpu.train.step import (
    init_train_state,
    loss_fn,
    make_optimizer,
    make_train_step_augmented,
)


def _force(out):
    """Hard sync: axon needs a host FETCH, not block_until_ready."""
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def timed(name, fn, iters=20, warmup=8):
    for _ in range(warmup):
        out = fn()
    _force(out)
    t0 = time.time()
    last = None
    for _ in range(iters):
        last = fn()
    _force(last)  # in-order queue: waiting on the last waits on all
    elapsed = (time.time() - t0) / iters * 1e3
    print(f"{name:28s} {elapsed:8.2f} ms", flush=True)
    return elapsed


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sr, chunk_s = 16_000, 20.0
    n = int(chunk_s * sr)
    conf = VapConfig(dtype="bfloat16")
    params = init_vap(jax.random.key(0), conf)
    tx = make_optimizer(OptConfig(), conf.freeze_encoder)
    state = init_train_state(params, tx)

    rng = np.random.default_rng(0)
    batch = {
        "waveform": jnp.asarray(
            rng.normal(size=(B, 2, n)).astype(np.float32) * 0.1
        ),
        "vad": jnp.asarray(
            (rng.random((B, int((chunk_s + 2) * 50), 2)) < 0.4).astype(np.float32)
        ),
    }
    key = jax.device_put(jax.random.key(1))

    fwd = jax.jit(lambda p, b, k: loss_fn(p, b, conf, k)[0])
    # NOTE: must return the grads too — returning only the value would
    # let XLA dead-code-eliminate the entire backward at compile time
    # (measured: "backward = 0.03 ms"), silently timing just the forward
    grad = jax.jit(
        lambda p, b, k: jax.value_and_grad(
            lambda pp: loss_fn(pp, b, conf, k)[0]
        )(p)
    )
    aug = jax.jit(
        lambda b, k: augment_on_device(
            dict(b), k, 1, do_flip=True, flip_prob=0.5, do_mask=False,
            mask_prob=0.5, noise_amplitude=0.01, sample_rate=sr, frame_hz=50,
        )["waveform"]
    )
    step = make_train_step_augmented(
        conf, tx, mono=False, do_flip=True, flip_prob=0.5, do_mask=False,
        mask_prob=0.5, noise_amplitude=0.01, sample_rate=sr, frame_hz=50,
    )

    t_aug = timed("augment (noise branch)", lambda: aug(batch, key))
    t_fwd = timed("loss forward", lambda: fwd(params, batch, key))
    t_grad = timed("value_and_grad", lambda: grad(params, batch, key))

    # the donated full step mutates state; rebuild per timing block
    holder = {"s": init_train_state(
        jax.tree.map(jnp.copy, params), tx)}

    def run_step():
        holder["s"], m = step(holder["s"], batch, key, 1)
        return m["loss"]

    t_step = timed("full fused train step", run_step)
    print(
        f"\n# decomposition (B={B}): backward = grad - fwd = "
        f"{t_grad - t_fwd:.2f} ms; optimizer+augment+dispatch overhead = "
        f"step - grad - aug = {t_step - t_grad - t_aug:.2f} ms"
    )


if __name__ == "__main__":
    main()
