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


def test_train_step_flops_accounting():
    """stereo_train_flops: frozen backward < unfrozen (the conv/GRU
    backward is the bulk), the flash recompute term counts the score
    matmuls once per attention site, and totals are component sums."""
    from voiceactivityprojection_tpu.utils.flops import (
        stereo_forward_flops,
        stereo_train_flops,
    )

    fwd = stereo_forward_flops(320_000)
    frozen = stereo_train_flops(320_000, frozen_encoder=True)
    unfrozen = stereo_train_flops(320_000, frozen_encoder=False)
    for d in (frozen, unfrozen):
        assert d["total"] == d["forward"] + d["backward"] + d["flash_recompute"]
        assert d["forward"] == fwd["total"]
    assert frozen["backward"] < unfrozen["backward"]
    # frozen boundary: tail at 2x + downsample dW at 1x
    tail = fwd["ar_channel"] + fwd["ar_stereo"] + fwd["combinator_heads"]
    assert frozen["backward"] == pytest.approx(
        2 * tail + fwd["downsample"], rel=1e-9
    )
    assert unfrozen["backward"] == pytest.approx(
        2 * (fwd["total"] - fwd["total"] + fwd["conv_stack"] + fwd["gru"]
             + fwd["downsample"] + tail),
        rel=1e-9,
    )
    # no-recompute variant drops exactly the recompute term
    nr = stereo_train_flops(320_000, flash_recompute=False)
    assert nr["flash_recompute"] == 0.0
    assert nr["total"] == frozen["total"] - frozen["flash_recompute"]


def test_vad_list_cache_unbounded_and_clearable(tmp_path):
    """data/dataset.py: the vad-list cache must not thrash at corpus scale
    (unbounded; VERDICT r2 weak #8) and must be explicitly clearable."""
    import json

    from voiceactivityprojection_tpu.data.dataset import (
        _read_vad_list,
        clear_vad_cache,
    )

    clear_vad_cache()
    n = 200  # > the old maxsize=64 that thrashed under shuffle
    for i in range(n):
        p = tmp_path / f"v{i}.json"
        p.write_text(json.dumps([[[0.0, 1.0]], []]))
        _read_vad_list(str(p))
    info = _read_vad_list.cache_info()
    assert info.currsize == n and info.maxsize is None
    # second pass: all hits
    h0 = info.hits
    for i in range(n):
        _read_vad_list(str(tmp_path / f"v{i}.json"))
    assert _read_vad_list.cache_info().hits == h0 + n
    clear_vad_cache()
    assert _read_vad_list.cache_info().currsize == 0
