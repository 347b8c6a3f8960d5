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


def _run(pid: int, port: int, n_dev: int) -> subprocess.Popen:
    env = dict(
        os.environ,
        PYTHONPATH=f"{ROOT}:/root/.axon_site",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_dev}",
        VAP_PLATFORM="cpu",
    )
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _loss(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("RESULT loss="):
            return float(line.split("=")[1])
    raise AssertionError(f"no RESULT line in:\n{out[-3000:]}")


def test_two_process_dp_matches_single_process():
    port = _free_port()
    p0 = _run(0, port, 4)
    p1 = _run(1, port, 4)
    out0, _ = p0.communicate(timeout=600)
    out1, _ = p1.communicate(timeout=600)
    assert p0.returncode == 0, out0[-3000:]
    assert p1.returncode == 0, out1[-3000:]

    base = _run(-1, 0, 8)
    outb, _ = base.communicate(timeout=600)
    assert base.returncode == 0, outb[-3000:]

    l0, l1, lb = _loss(out0), _loss(out1), _loss(outb)
    assert l0 == l1, (l0, l1)  # both processes see the same global loss
    assert abs(l0 - lb) < 1e-5, (l0, lb)  # equals single-process baseline
