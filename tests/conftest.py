"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware.

Note: this image pre-imports jax via a site hook, so plain env vars in this
file can come too late; `jax.config.update` still works because backend
initialization is lazy (no computation has run before conftest loads).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; got " + jax.devices()[0].platform
    )
    assert len(jax.devices()) == 8, f"expected 8 virtual devices, got {len(jax.devices())}"
