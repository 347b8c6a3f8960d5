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
