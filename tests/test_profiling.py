"""Smoke tests for the profiling/observability helpers (SURVEY.md §5.1;
mirrors the intent of reference analyzes/model_params_grad.py hooks)."""

import numpy as np
import jax

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
