"""Shared timing discipline for the example benches.

One canonical implementation of the chained-dispatch / single-host-fetch
pattern (CLAUDE.md "host fetch costs ~28 ms"): dispatch `iters` steps
back-to-back, then force execution ONCE by fetching a scalar — the axon
backend needs a host FETCH, `block_until_ready` alone does not flush it,
and the in-order queue means waiting on the last step waits on all.
"""
import time

import jax
import jax.numpy as jnp


def force(out) -> None:
    """Hard sync: fetch one scalar derived from `out` to the host."""
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def timed(name, fn, iters: int = 30, warmup: int = 10, width: int = 40):
    """Print and return steady-state ms/call for `fn` (chained dispatch)."""
    out = None
    for _ in range(warmup):
        out = fn()
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    force(out)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:{width}s} {ms:8.3f} ms", flush=True)
    return ms
