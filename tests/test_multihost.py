"""REAL multi-process data parallelism (SURVEY.md §5.8): two OS processes
x 4 virtual CPU devices each, joined by jax.distributed over a local
coordinator — the same code path `train.py --multihost` uses on TPU pods
(gradient reduction rides the collective backend across the process
boundary; each process feeds only its LOCAL batch slice).

The reference has no distributed test at all ("Distributed testing:
none", SURVEY.md §4); here the 2-process VAP training-step loss must
equal the single-process 8-device baseline bit-for-bit-ish (same global
batch, same seeds).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.train, pytest.mark.slow]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(pid: int, port: int, n_dev: int, n_proc: int = 2,
         n_steps: int = 1) -> subprocess.Popen:
    env = dict(
        os.environ,
        PYTHONPATH=f"{ROOT}:/root/.axon_site",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_dev}",
        VAP_PLATFORM="cpu",
    )
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port), str(n_proc), str(n_steps)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _result(out: str):
    for line in out.splitlines():
        if line.startswith("RESULT loss="):
            parts = dict(kv.split("=") for kv in line[len("RESULT "):].split())
            return float(parts["loss"]), float(parts["step_ms"])
    raise AssertionError(f"no RESULT line in:\n{out[-3000:]}")


def _loss(out: str) -> float:
    return _result(out)[0]


@pytest.mark.parametrize("n_proc", [2, 4])
def test_nproc_dp_matches_single_process(n_proc):
    """N processes x (8/N) virtual devices each == the 8-device
    single-process baseline, same global batch (the scaling-rehearsal
    harness; examples/multihost_rehearsal.py reports the efficiency)."""
    port = _free_port()
    procs = [_run(i, port, 8 // n_proc, n_proc) for i in range(n_proc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)

    base = _run(-1, 0, 8)
    outb, _ = base.communicate(timeout=600)
    assert base.returncode == 0, outb[-3000:]

    losses = [_loss(o) for o in outs]
    lb = _loss(outb)
    assert len(set(losses)) == 1, losses  # every process sees the global loss
    assert abs(losses[0] - lb) < 1e-5, (losses[0], lb)
