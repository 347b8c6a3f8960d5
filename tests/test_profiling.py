"""Smoke tests for the profiling/observability helpers (SURVEY.md §5.1;
mirrors the intent of reference analyzes/model_params_grad.py hooks)."""

import numpy as np
import jax
import pytest

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import VapModel
from voiceactivityprojection_tpu.utils.profiling import (
    activation_stats,
    gradient_stats,
    tree_stats,
)


def _tiny_model():
    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    return VapModel.init(jax.random.key(0), conf)


def test_tree_stats_keys_and_fields():
    model = _tiny_model()
    stats = tree_stats(model.params)
    assert any("vap_head" in k for k in stats)
    one = next(iter(stats.values()))
    for field in ("mean", "std", "absmax", "frac_zero", "hist"):
        assert field in one, one.keys()


def test_activation_and_gradient_stats():
    model = _tiny_model()
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(1, 2, 8000)).astype(np.float32) * 0.1
    acts = activation_stats(model, wav)
    assert "logits" in acts and "encoder_x1" in acts

    batch = {
        "waveform": wav,
        "vad": (rng.random((1, 125, 2)) < 0.4).astype(np.float32),
    }
    grads = gradient_stats(model, batch)
    assert any(k.startswith("grad/") for k in grads)
    # frozen encoder: grads exist as leaves (zeros come from the optimizer
    # mask at update time, not here); heads must have nonzero gradient
    head = [v for k, v in grads.items() if "vap_head" in k][0]
    assert head["absmax"] > 0.0


def test_analytic_flops_accounting():
    """utils/flops.py: stage counts are positive, total is their sum, and
    the 20 s stereo chunk lands at the expected scale (~75 GFLOP — the
    conv front-end dominates)."""
    from voiceactivityprojection_tpu.utils.flops import (
        device_peak_tflops,
        stereo_forward_flops,
    )

    st = stereo_forward_flops(320_000)
    assert all(v > 0 for v in st.values())
    parts = sum(v for k, v in st.items() if k != "total")
    assert st["total"] == parts
    assert 60e9 < st["total"] < 90e9, st["total"]
    assert st["conv_stack"] > 0.5 * st["total"]
    # time scaling: 2x samples ~ 2x conv flops, superlinear attention
    st2 = stereo_forward_flops(640_000)
    assert st2["conv_stack"] == pytest.approx(2 * st["conv_stack"], rel=1e-6)
    assert st2["ar_stereo"] > 2 * st["ar_stereo"]
    # CPU test platform: unknown device kind -> None (bench guards on it)
    assert device_peak_tflops() is None
