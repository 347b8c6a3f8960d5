"""Worker process for the multi-host training tests/rehearsal (spawned by
tests/test_multihost.py and examples/multihost_rehearsal.py).

Runs real stereo VAP training steps over a process-spanning mesh: every
process holds only its LOCAL batch slice (the per-host input pipeline
contract, SURVEY.md §5.8), shard_batch assembles the global array, and
XLA reduces gradients with psum across the Gloo-backed "DCN". Prints the
resulting loss and (when steps > 1) the per-step time for the parent to
compare/aggregate.

Usage: multihost_worker.py PID PORT [N_PROCESSES] [N_STEPS]
PID=-1 runs single-process (the baseline).
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    n_proc = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    if pid >= 0:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=n_proc,
            process_id=pid,
        )

    import numpy as np
    import jax.numpy as jnp

    from voiceactivityprojection_tpu.config import OptConfig, VapConfig
    from voiceactivityprojection_tpu.models.vap import init_vap
    from voiceactivityprojection_tpu.parallel.mesh import (
        make_mesh,
        replicate_tree,
        shard_batch,
    )
    from voiceactivityprojection_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    params = init_vap(jax.random.key(0), conf)
    tx = make_optimizer(OptConfig())
    state = init_train_state(params, tx)

    mesh = make_mesh()
    local_b = 8 // jax.process_count() if pid >= 0 else 8
    # deterministic GLOBAL batch; each process slices its own rows so the
    # multi-process run sees exactly the single-process data
    rng = np.random.default_rng(42)
    gw = (rng.normal(size=(8, 2, 16000)) * 0.1).astype(np.float32)
    gv = (rng.random((8, 150, 2)) < 0.5).astype(np.float32)
    lo = (pid if pid >= 0 else 0) * local_b
    local = {"waveform": gw[lo : lo + local_b], "vad": gv[lo : lo + local_b]}

    with jax.set_mesh(mesh):
        state = replicate_tree(state, mesh)
        batch = shard_batch(local, mesh)
        step = make_train_step(conf, tx)
        state, metrics = step(state, batch, jax.random.key(1))
        loss0 = float(metrics["loss"])  # also syncs compile
        step_ms = float("nan")
        if n_steps > 1:
            # steady-state timing: fixed rng per step index so every
            # process dispatches identical programs
            t0 = time.perf_counter()
            for i in range(n_steps):
                state, metrics = step(state, batch, jax.random.key(2 + i))
            jax.block_until_ready(metrics)
            float(metrics["loss"])
            step_ms = 1e3 * (time.perf_counter() - t0) / n_steps
        print(f"RESULT loss={loss0:.6f} step_ms={step_ms:.2f}", flush=True)


if __name__ == "__main__":
    main()
