"""Float64 exactness of the parity chain (VERDICT round-1 item 1).

The f32 full-model diff (tests/test_reference_full_model.py) tolerates
2e-3 on logits — loose enough to hide a subtle layout/epsilon bug. This
test runs the same our-weights -> reference-VapGPT chain end to end in
float64 in a SUBPROCESS (jax_enable_x64 is a process-global flag; a child
interpreter keeps it out of this suite) and requires logits agreement at
1e-8 (observed ~1e-12), plus a synthetic-CPC-blob round-trip in the exact
libri-light on-disk format against the reference's own `load_CPC`
(encoder_components.py:206-217,371-402).
"""

import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "f64_parity_child.py")

needs_ref = pytest.mark.skipif(
    not os.path.isdir("/root/reference/vap"), reason="no reference mount"
)


@needs_ref
def test_f64_parity_chain():
    pytest.importorskip("torch")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no need for 8 virtual devices in the child
    env["VAP_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, CHILD],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, (
        f"f64 parity child failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "ALL OK" in proc.stdout
    # every check line must be present (the child prints CHECK <name> ...)
    for name in (
        "stereo.logits",
        "stereo.p_now",
        "mono.logits",
        "cpc.encodedData",
        "cpc.cFeature",
        "extract.p_now",
    ):
        assert f"CHECK {name}" in proc.stdout, proc.stdout
