"""Plot utilities (core subset of reference vap/plot_utils.py:12-733).

Implements the functions the CLI and probes actually use: mel-spectrogram
panels, VAD overlays, next-speaker probability panels, and the stereo
summary figure written by run.py (plot_utils.plot_stereo). Matplotlib with
Agg-safe usage (no display required).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_melspectrogram(
    waveform: np.ndarray,
    ax,
    n_mels: int = 80,
    frame_time: float = 0.05,
    sample_rate: int = 16_000,
    cmap: str = "magma",
):
    """Log-mel image on an axis, x-axis in SECONDS (so panels with
    probability curves can share it)."""
    from voiceactivityprojection_tpu.ops.audio import log_mel_spectrogram

    w = np.asarray(waveform)
    hop = int(frame_time * sample_rate)
    mel = log_mel_spectrogram(w, n_mels=n_mels, hop_length=hop, sample_rate=sample_rate)
    duration = w.shape[-1] / sample_rate
    ax.imshow(
        mel, aspect="auto", origin="lower", interpolation="none", cmap=cmap,
        extent=[0.0, duration, 0.0, float(n_mels)],
    )
    ax.set_yticks([])
    return ax


def plot_vad(x: np.ndarray, vad: np.ndarray, ax, ypad: float = 0.0, color="w", **kw):
    """Step-plot a binary VAD track scaled onto the current axis."""
    y0, y1 = ax.get_ylim()
    scaled = y0 + ypad + np.asarray(vad) * (y1 - y0 - 2 * ypad) * 0.95
    ax.step(np.asarray(x), scaled, where="post", color=color, linewidth=2, **kw)
    return ax


def plot_next_speaker_probs(p: np.ndarray, ax, frame_hz: int = 50, color=("b", "orange")):
    """Filled area plot of per-speaker next-speaker probability."""
    p = np.asarray(p)
    x = np.arange(p.shape[0]) / frame_hz
    ax.fill_between(x, 0.5, p[:, 0], where=p[:, 0] >= 0.5, color=color[0], alpha=0.7)
    ax.fill_between(x, p[:, 0], 0.5, where=p[:, 0] < 0.5, color=color[1], alpha=0.7)
    ax.axhline(0.5, color="k", linewidth=0.8, linestyle=":")
    ax.set_ylim([0, 1])
    return ax


def plot_stereo(
    waveform: np.ndarray,
    p_now: np.ndarray,
    p_future: np.ndarray,
    vad: np.ndarray,
    savepath: Optional[str] = None,
    frame_hz: int = 50,
    sample_rate: int = 16_000,
    figsize=(12, 8),
):
    """Summary figure: per-channel mel + model VAD, p_now, p_future panels
    (contract of plot_utils.plot_stereo used at run.py:267-279)."""
    plt = _plt()
    fig, ax = plt.subplots(4, 1, figsize=figsize, sharex=True)

    waveform = np.asarray(waveform)
    T = np.asarray(p_now).shape[0]
    x = np.arange(T) / frame_hz  # shared seconds axis

    plot_melspectrogram(waveform[0], ax=ax[0], sample_rate=sample_rate)
    ax[0].set_ylabel("A")
    ax[0].set_ylim([0, 80])
    plot_vad(x, np.asarray(vad)[:T, 0], ax[0], ypad=2)

    plot_melspectrogram(waveform[1], ax=ax[1], sample_rate=sample_rate)
    ax[1].set_ylabel("B")
    ax[1].set_ylim([0, 80])
    plot_vad(x, np.asarray(vad)[:T, 1], ax[1], ypad=2)

    plot_next_speaker_probs(np.asarray(p_now)[:T], ax[2], frame_hz)
    ax[2].set_ylabel("p_now")
    plot_next_speaker_probs(np.asarray(p_future)[:T], ax[3], frame_hz)
    ax[3].set_ylabel("p_future")
    ax[3].set_xlabel("time (s)")

    plt.tight_layout()
    if savepath:
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
    return fig, ax


def plot_entropy(H: np.ndarray, ax, frame_hz: int = 50, color="g"):
    H = np.asarray(H)
    x = np.arange(H.shape[0]) / frame_hz
    ax.plot(x, H, color=color, linewidth=2)
    ax.set_ylim([0, 8])
    ax.set_ylabel("H (bits)")
    return ax


def plot_waveform(waveform: np.ndarray, ax, sample_rate: int = 16_000, color="b"):
    w = np.asarray(waveform).ravel()
    x = np.arange(len(w)) / sample_rate
    ax.plot(x, w, color=color, linewidth=0.5)
    ax.set_ylim([-1, 1])
    return ax


def plot_phrases_sample(
    sample: dict,
    p_now: np.ndarray,
    p_future: np.ndarray,
    savepath: Optional[str] = None,
    frame_hz: int = 50,
    sample_rate: int = 16_000,
    figsize=(12, 6),
):
    """Phrase-probe figure: mel + word alignment + p panels with EOT/SCP
    markers (contract of reference plot_utils phrase figure)."""
    plt = _plt()
    fig, ax = plt.subplots(3, 1, figsize=figsize, sharex=False)

    w = np.asarray(sample["waveform"])[0]
    plot_melspectrogram(w, ax=ax[0], sample_rate=sample_rate)
    ax[0].set_title(
        f"{sample['phrase']} ({sample['long_short']}, {sample['gender']})",
        fontsize=10,
    )
    T = np.asarray(p_now).shape[0]
    for i, (word, start) in enumerate(zip(sample["words"], sample["starts"])):
        xpos = start * frame_hz / T * ax[0].get_xlim()[1]
        ax[0].axvline(xpos, color="w", linewidth=0.5, alpha=0.5)
        ax[0].text(xpos, 70, word, color="w", fontsize=7, rotation=45)

    for axis, p, name in ((ax[1], p_now, "p_now"), (ax[2], p_future, "p_future")):
        plot_next_speaker_probs(np.asarray(p), axis, frame_hz)
        axis.set_ylabel(name)
        axis.axvline(sample["end"] / frame_hz, color="r", linewidth=1.5, label="EOT")
        if sample["long_short"] == "long":
            axis.axvline(sample["scp"] / frame_hz, color="m", linewidth=1.5, label="SCP")
    ax[1].legend(loc="upper left", fontsize=7)

    plt.tight_layout()
    if savepath:
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
    return fig, ax


def plot_threshold_curves(
    curves: dict, savepath: Optional[str] = None, title: str = "", figsize=(8, 4)
):
    """F1/balanced-accuracy/PR curves from train.evaluation.get_curves
    (contract of reference evaluation.py curve plots)."""
    plt = _plt()
    fig, ax = plt.subplots(1, 1, figsize=figsize)
    t = np.asarray(curves["thresholds"])
    for key, style in (
        ("f1_weighted", "-"),
        ("balanced_accuracy", "--"),
        ("precision", ":"),
        ("recall", "-."),
    ):
        ax.plot(t, np.asarray(curves[key]), style, label=key)
    best = int(np.argmax(curves["f1_weighted"]))
    ax.axvline(t[best], color="r", linewidth=1, alpha=0.6)
    ax.set_xlabel("threshold")
    ax.set_ylim([0, 1.02])
    ax.legend(fontsize=8)
    if title:
        ax.set_title(title)
    plt.tight_layout()
    if savepath:
        fig.savefig(savepath, dpi=100)
        plt.close(fig)
    return fig, ax
