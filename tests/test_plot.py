"""Plot-utility smoke tests (Agg backend; just verify figures render)."""

import os

import numpy as np
import pytest

from voiceactivityprojection_tpu.utils.plot import (
    plot_stereo,
    plot_threshold_curves,
    plot_phrases_sample,
)

pytestmark = pytest.mark.evaluation


def test_plot_stereo(tmp_path):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(2, 32000)).astype(np.float32) * 0.1
    T = 100
    p = rng.random((T, 2)).astype(np.float32)
    p = p / p.sum(-1, keepdims=True)
    vad = (rng.random((T, 2)) < 0.5).astype(np.float32)
    out = tmp_path / "stereo.png"
    plot_stereo(w, p, p, vad, savepath=str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_plot_threshold_curves(tmp_path):
    from voiceactivityprojection_tpu.train.evaluation import get_curves

    rng = np.random.default_rng(1)
    curves = get_curves(rng.random(100), (rng.random(100) < 0.5).astype(int))
    out = tmp_path / "curves.png"
    plot_threshold_curves(curves, savepath=str(out), title="hs")
    assert out.exists()


def test_plot_phrases_sample(tmp_path):
    rng = np.random.default_rng(2)
    sample = {
        "waveform": rng.normal(size=(2, 16000)).astype(np.float32) * 0.1,
        "phrase": "student",
        "long_short": "long",
        "gender": "female",
        "words": ["are", "you", "a", "student"],
        "starts": [0.0, 0.1, 0.3, 0.4],
        "end": 40,
        "scp": 35,
    }
    p = rng.random((50, 2)).astype(np.float32)
    out = tmp_path / "phrase.png"
    plot_phrases_sample(sample, p, p, savepath=str(out))
    assert out.exists()
