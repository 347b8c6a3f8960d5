"""On-chip check + bench of the offset flash kernel (context parallelism).

Validates `flash_alibi_attention_offset` numerically ON hardware against
the dense reference for a mid-sequence query block (interpret mode can
mask Mosaic layout bugs), then times it at a context-parallel shape:
T_loc query rows attending a full T-key timeline.

Usage: python examples/bench_context_attention.py [T] [n_dev]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.ops.attention import alibi_slopes
from voiceactivityprojection_tpu.ops import flash_alibi as fa


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B, H, Dh = 1, 4, 64
    t_loc = T // n_dev
    scale = 1.0 / np.sqrt(H * Dh)
    slopes = alibi_slopes(H)
    rng = np.random.default_rng(0)
    mk = lambda s: jnp.asarray(rng.normal(size=s), jnp.bfloat16)
    k, v = mk((B, H, T, Dh)), mk((B, H, T, Dh))
    q_full = mk((B, H, T, Dh))

    # numeric check on a mid-sequence block (device n_dev//2's rows)
    off = (n_dev // 2) * t_loc
    q_loc = q_full[:, :, off : off + t_loc]
    want = jax.jit(
        lambda q, k, v: fa._dense_reference(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), slopes, scale,
        )
    )(q_full, k, v)[:, :, off : off + t_loc]
    got = jax.jit(
        lambda q, k, v, o: fa.flash_alibi_attention_offset(q, k, v, slopes, scale, o)
    )(q_loc, k, v, jnp.int32(off))
    err = float(jnp.abs(got.astype(jnp.float32) - jnp.asarray(want)).max())
    print(f"offset kernel err vs dense (T={T}, off={off}): {err:.2e}")
    assert err < 5e-2, err

    jfn = jax.jit(
        lambda q, k, v, o: fa.flash_alibi_attention_offset(q, k, v, slopes, scale, o)
    )
    acc = jnp.zeros(())
    for _ in range(8):
        acc = acc + jfn(q_loc, k, v, jnp.int32(off)).astype(jnp.float32).sum()
    float(acc)
    iters = 20
    t0 = time.time()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = acc + jfn(q_loc, k, v, jnp.int32(off)).astype(jnp.float32).sum()
    float(acc)
    ms = (time.time() - t0) / iters * 1e3
    print(f"offset flash pass (Tq={t_loc}, Tk={T}): {ms:.3f} ms")


if __name__ == "__main__":
    main()
