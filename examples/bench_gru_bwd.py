"""A/B the Pallas GRU backward (reverse-recurrence kernel) vs scan BPTT.

The unfrozen-encoder train step differentiates the GRU: before round 5
the custom_vjp recomputed the forward with lax.scan and ran XLA's scan
backward (two sequential chains). The new `_backward_pallas`
(ops/gru_pallas.py) runs ONE reverse grid with gates recomputed in-kernel
(3 MXU matmuls/step, dW/db accumulated in resident VMEM blocks).

Levels:
  1. recurrence-only grad at the encoder train shape
     (rows = 2 channels x B, T = 2000 @ 100 Hz, H = 256)
  2. full UNFROZEN fused train step (B=16 bf16) both ways

Usage (TPU): python examples/bench_gru_bwd.py [B]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax
import jax.numpy as jnp

from _bench_util import timed


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if pos else 16
    H, T = 256, 2000
    rows = 2 * B

    from voiceactivityprojection_tpu.ops.gru_pallas import (
        gru_recurrence_pallas,
    )

    ks = jax.random.split(jax.random.key(0), 4)
    xp = (jax.random.normal(ks[0], (rows, T, 3 * H)) * 0.5).astype(jnp.bfloat16)
    w_hh = (jax.random.normal(ks[1], (H, 3 * H)) * 0.08).astype(jnp.bfloat16)
    b_hh = (jax.random.normal(ks[2], (3 * H,)) * 0.1).astype(jnp.bfloat16)
    h0 = jnp.zeros((rows, H), jnp.bfloat16)

    def loss(xp, w, b, h):
        ys, hl = gru_recurrence_pallas(xp, w, b, h)
        return (ys.astype(jnp.float32) ** 2).sum()

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    fwd = jax.jit(lambda: gru_recurrence_pallas(xp, w_hh, b_hh, h0)[0].sum())

    print(f"# recurrence shape rows={rows} T={T} H={H} bf16")
    t_f = timed("fwd (pallas kernel)", fwd)
    for mode in ("pallas", "scan"):
        os.environ["VAP_GRU_BWD"] = mode
        jax.clear_caches()  # env read at trace time
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        t = timed(f"fwd+bwd (VAP_GRU_BWD={mode})", lambda: g(xp, w_hh, b_hh, h0))
        print(f"#   backward alone ~ {t - t_f:.2f} ms")

    # ---- level 2: full unfrozen train step
    from voiceactivityprojection_tpu.config import OptConfig, VapConfig
    from voiceactivityprojection_tpu.models.vap import init_vap
    from voiceactivityprojection_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step_augmented,
    )

    sr, chunk_s = 16_000, 20.0
    n = int(chunk_s * sr)
    conf = VapConfig(dtype="bfloat16", freeze_encoder=False)
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
    print(f"\n# full UNFROZEN train step B={B} bf16")
    for mode in ("pallas", "scan"):
        os.environ["VAP_GRU_BWD"] = mode
        jax.clear_caches()
        params = init_vap(jax.random.key(0), conf)
        tx = make_optimizer(OptConfig(), conf.freeze_encoder)
        step = make_train_step_augmented(
            conf, tx, mono=False, do_flip=True, flip_prob=0.5, do_mask=False,
            mask_prob=0.5, noise_amplitude=0.01, sample_rate=sr, frame_hz=50,
        )
        holder = {"s": init_train_state(params, tx)}

        def run():
            holder["s"], m = step(holder["s"], batch, key, 1)
            return m["loss"]

        timed(f"unfrozen step (VAP_GRU_BWD={mode})", run)


if __name__ == "__main__":
    main()
