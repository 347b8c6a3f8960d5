"""Multi-host scaling REHEARSAL on a single machine (VERDICT item 4).

Real multi-host efficiency needs >=2 TPU hosts (`train.py --multihost`
on each host measures it directly via the epoch records' steps/train_s).
This harness rehearses the exact same code path — jax.distributed over a
local coordinator, per-process local batches, psum gradient reduction —
with N OS processes x (8/N) virtual CPU devices each, and reports a
scaling table. On a shared-CPU box the absolute numbers measure collective
+ framework overhead, not compute scaling (all configs share the same
cores), so read "efficiency" as a smoke-level sanity signal; the losses
are asserted equal across configurations (same global batch).

    python examples/multihost_rehearsal.py [--steps 8]
"""

import argparse
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_config(n_proc: int, steps: int):
    port = free_port()
    procs = []
    for pid in range(n_proc) if n_proc > 1 else [-1]:
        env = dict(
            os.environ,
            PYTHONPATH=f"{ROOT}:/root/.axon_site",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={8 // max(n_proc, 1)}",
            VAP_PLATFORM="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(port),
                 str(n_proc), str(steps)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(out[-3000:])
        for line in out.splitlines():
            if line.startswith("RESULT "):
                kv = dict(s.split("=") for s in line[len("RESULT "):].split())
                results.append((float(kv["loss"]), float(kv["step_ms"])))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    rows = []
    base_ms = None
    losses = set()
    for n in (1, 2, 4):
        res = run_config(n, args.steps)
        step_ms = max(ms for _, ms in res)  # slowest process gates the step
        losses.update(round(l, 6) for l, _ in res)
        if base_ms is None:
            base_ms = step_ms
        eff = base_ms / step_ms  # same global batch: ideal is 1.0
        rows.append((n, step_ms, eff))
        print(f"procs={n}  step={step_ms:7.1f} ms  vs-1-proc={eff:5.2f}x")
    assert len(losses) == 1, f"losses diverged across configs: {losses}"
    print("losses identical across configurations:", losses.pop())


if __name__ == "__main__":
    main()
