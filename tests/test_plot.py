"""Plot-utility smoke tests (Agg backend; just verify figures render)."""

import os

import numpy as np
import pytest

from voiceactivityprojection_tpu.utils.plot import (
    plot_stereo,
    plot_threshold_curves,
    plot_phrases_sample,
    plot_vap,
    plot_event,
    plot_evaluation_scores,
    plot_stereo_mel_spec,
    plot_mel_spec,
    plot_sample_waveform,
    plot_sample_mel_spec,
    plot_sample_f0,
    plot_next_speaker_probs,
    plot_words_time,
    to_mono,
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


def test_plot_vap_full_figure(tmp_path):
    """plot_vap contract (reference plot_utils.py:179-254): 5 panels with
    p_future, VAD overlays, event shading on the mel axes."""
    rng = np.random.default_rng(3)
    w = rng.normal(size=(2, 32000)).astype(np.float32) * 0.1
    T = 100
    p_now = rng.random(T).astype(np.float32)
    p_fut = rng.random(T).astype(np.float32)
    vad = (rng.random((T, 2)) < 0.5).astype(np.float32)
    out = tmp_path / "vap.png"
    fig, ax = plot_vap(w, p_now, p_fut=p_fut, vad=vad, savepath=str(out))
    assert len(ax) == 5
    assert out.exists() and out.stat().st_size > 1000


def test_plot_event_and_words(tmp_path):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(2, 1)
    for a in ax:
        a.set_ylim([0, 80])
    plot_event([(10, 30, 0), (50, 70, 1)], ax, frame_hz=50)
    plot_words_time(["hi", "there"], ax[0], starts=[0.1, 0.5], ends=[0.4, 0.9])
    fig.savefig(tmp_path / "ev.png")
    plt.close(fig)


def test_plot_evaluation_scores(tmp_path):
    scores = {
        "f1_hold_shift": 0.87,
        "f1_predict_shift": 0.79,
        "f1_short_long": 0.78,
        "f1_bc_prediction": 0.72,
        "shift": {"f1": 0.61},
        "hold": {"f1": 0.92},
        "loss": 1.74,
        "threshold_pred_shift": 0.09,
        "threshold_pred_bc": 0.05,
        "threshold_short_long": 0.31,
    }
    out = tmp_path / "scores.png"
    fig, ax, returned = plot_evaluation_scores(scores, savepath=str(out))
    assert out.exists()
    assert returned["loss"] == 1.74


def test_plot_mel_panels_and_samples(tmp_path):
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(4)
    w = rng.normal(size=(2, 16000)).astype(np.float32) * 0.1
    vad = (rng.random((50, 2)) < 0.5).astype(np.float32)

    fig, ax = plt.subplots(4, 1)
    plot_stereo_mel_spec(w, ax=[ax[0], ax[1]], vad=vad)
    plot_mel_spec(w[0], ax=ax[2], vad=vad[:, 0], no_ticks=True)
    plot_next_speaker_probs(
        rng.random((50, 2)), ax[3], p_bc=rng.random((50, 2)) * 0.3,
        vad=vad, legend=True,
    )
    fig.savefig(tmp_path / "mels.png")
    plt.close(fig)

    fig, ax = plt.subplots(3, 1)
    plot_sample_waveform(w[0], ax[0], words=["a", "b"], starts=[0.1, 0.5],
                         ends=[0.4, 0.9])
    plot_sample_mel_spec(w[0], ax[1], words=["a", "b"], starts=[0.1, 0.5])
    plot_sample_f0(w[0], ax[2])
    fig.savefig(tmp_path / "sample.png")
    plt.close(fig)


def test_to_mono():
    w = np.ones((2, 100), dtype=np.float32)
    w[1] *= 3.0
    m = to_mono(w)
    assert m.shape == (1, 100)
    np.testing.assert_allclose(m, 2.0)
    b = to_mono(np.ones((4, 2, 100), dtype=np.float32))
    assert b.shape == (4, 1, 100)


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


def test_interface_stereo_phrases_export(tmp_path):
    """Headless PNG export mode of the phrases browser (reference
    analyzes/interface_stereo_phrases.py equivalent)."""
    import os
    import subprocess
    import sys

    if not os.path.exists("/root/reference/dataset_phrases/phrases.csv"):
        import pytest

        pytest.skip("no phrases corpus")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "phr"
    r = subprocess.run(
        [sys.executable, "analyzes/interface_stereo_phrases.py",
         "--export", str(out), "--limit", "1",
         "--vap_dim", "16", "--vap_encoder_dim", "16",
         "--vap_channel_layers", "1", "--vap_cross_layers", "1"],
        cwd=root, capture_output=True, text=True,
        env=dict(os.environ, VAP_PLATFORM="cpu"), timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert list(out.glob("*.png"))
