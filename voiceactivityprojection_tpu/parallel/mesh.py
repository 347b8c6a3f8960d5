"""Device mesh + sharding helpers.

The reference's only distribution strategy is NCCL data parallelism via
Lightning DDP (vap/train.py:17,237). The TPU-native equivalent: a
`jax.sharding.Mesh` with a leading "data" axis; batches are sharded over
it, params replicated, and XLA inserts the gradient psum over ICI during
`jit` sharding propagation. A second "model" axis is provisioned for
tensor-parallel experiments (head/FFN sharding) but defaults to size 1 —
the model is ~5-10 M params and DP is the right strategy (SURVEY.md §2.14).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh then spans all processes and the same code scales over DCN-connected
hosts with per-host data feeding (`shard_batch` handles local shards).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data", replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every array in the batch dict with its leading axis sharded
    over the mesh's "data" axis.

    Multi-host: each process holds its LOCAL batch slice (numpy); a plain
    device_put onto a process-spanning sharding is not addressable, so the
    global array is assembled from the per-process shards instead (the
    global batch dimension is n_processes x local batch)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
