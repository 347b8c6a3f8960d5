"""Evaluation harness tests: threshold curves and the collector."""

import numpy as np
import pytest

from voiceactivityprojection_tpu.train.evaluation import (
    find_threshold,
    get_curves,
)

pytestmark = pytest.mark.evaluation


def test_get_curves_perfect_separator():
    preds = np.concatenate([np.full(50, 0.1), np.full(50, 0.9)])
    targets = np.concatenate([np.zeros(50), np.ones(50)]).astype(int)
    thr, curves = find_threshold(preds, targets)
    assert 0.1 < thr <= 0.9
    assert curves["f1_weighted"].max() == pytest.approx(1.0)
    # degenerate threshold 0 -> everything predicted positive
    assert curves["recall"][0] == pytest.approx(1.0)


def test_get_curves_shapes():
    rng = np.random.default_rng(0)
    preds = rng.random(200)
    targets = (rng.random(200) < 0.3).astype(int)
    curves = get_curves(preds, targets)
    for k in ("thresholds", "f1_weighted", "balanced_accuracy", "precision", "recall"):
        assert curves[k].shape == (101,)
    assert np.all(curves["f1_weighted"] >= 0) and np.all(curves["f1_weighted"] <= 1)


def test_find_threshold_balanced_accuracy_metric():
    preds = np.concatenate([np.full(90, 0.4), np.full(10, 0.6)])
    targets = np.concatenate([np.zeros(90), np.ones(10)]).astype(int)
    thr, curves = find_threshold(preds, targets, metric="balanced_accuracy")
    assert 0.4 < thr <= 0.6
    assert curves["balanced_accuracy"].max() == pytest.approx(1.0)


def test_threshold_transfer_binarization():
    """EventMetrics with transferred thresholds binarizes at probs >= thr
    instead of the reference's 0.5 rounding (find-on-val / apply-at-test,
    reference evaluation.py:245-322)."""
    from voiceactivityprojection_tpu.events.metrics import EventMetrics

    # probs clustered at 0.3 / 0.45: at the default 0.5-rounding all go to
    # class 0; at a transferred threshold of 0.4 the 0.45s go to class 1
    probs = np.array([0.3, 0.3, 0.45, 0.45])
    targets = np.array([0, 0, 1, 1])
    batch = {"hs": probs, "ls": None, "pred_shift": None, "pred_backchannel": None}
    tbatch = {"hs": targets, "ls": None, "pred_shift": None, "pred_backchannel": None}

    em_default = EventMetrics()
    em_default.update(batch, tbatch)
    assert em_default.compute()["hs_acc_1"] == 0.0

    em_thr = EventMetrics({"hs": 0.4})
    em_thr.update(batch, tbatch)
    out = em_thr.compute()
    assert out["hs_acc_1"] == 1.0 and out["hs_acc_0"] == 1.0
    assert out["hs_f1w"] == pytest.approx(1.0)


def test_threshold_transfer_accepts_json_family_names():
    """thresholds.json uses the pooled family names (hs / ls / pred_shift
    / pred_backchannel); EventMetrics must accept both spellings and
    reject unknown families."""
    from voiceactivityprojection_tpu.events.metrics import EventMetrics

    em = EventMetrics({"pred_shift": 0.3, "pred_backchannel": 0.7, "hs": 0.5})
    assert em.thresholds == {"sp": 0.3, "bp": 0.7, "hs": 0.5}
    with pytest.raises(ValueError, match="unknown event family"):
        EventMetrics({"nope": 0.5})


def test_evaluate_applies_transferred_thresholds(tmp_path):
    """End-to-end: evaluate() with `thresholds=` produces metrics
    binarized at the transferred thresholds (checked against a rerun of
    the same pooled probabilities)."""
    import jax

    from voiceactivityprojection_tpu.config import EventConfig
    from voiceactivityprojection_tpu.train.evaluation import EvaluationCollector

    rng = np.random.default_rng(0)
    B, T = 2, 1100
    logits = rng.normal(size=(B, T - 100, 256)).astype(np.float32)
    # synthetic VAD with real turn structure so events exist
    vad = np.zeros((B, T, 2), dtype=np.float32)
    vad[:, :500, 0] = 1.0
    vad[:, 560:, 1] = 1.0

    ec = EventConfig()
    base = EvaluationCollector(ec, seed=0)
    base.update(logits, vad)
    res_search = base.compute(threshold_search=True)
    thr = {
        k.replace("threshold_", ""): v
        for k, v in res_search.items()
        if k.startswith("threshold_")
    }
    assert thr, res_search

    applied = EvaluationCollector(ec, seed=0, thresholds=thr)
    applied.update(logits, vad)
    res_applied = applied.compute(threshold_search=False)

    # recompute expectation manually from the pooled values
    for fam_json, fam_short in (("hs", "hs"), ("pred_shift", "sp")):
        if fam_json not in thr or not base.pooled[fam_json]:
            continue
        p = np.concatenate(base.pooled[fam_json])
        t = np.concatenate(base.pooled_t[fam_json])
        preds = (p >= thr[fam_json]).astype(int)
        acc1 = (preds[t == 1] == 1).mean() if (t == 1).any() else 0.0
        assert res_applied[f"test_{fam_short}_acc_1"] == pytest.approx(
            float(acc1)
        ), fam_json
