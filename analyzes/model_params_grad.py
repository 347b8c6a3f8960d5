"""Activation/gradient histogram analyzer
(mirrors reference analyzes/model_params_grad.py:8-161).

    python analyzes/model_params_grad.py [--state_dict sd.pt] [--out out.json]
        [--seconds 5] [--plot]

Runs a synthetic (or provided) batch through the model, collects per-stage
activation statistics and per-parameter gradient histograms, writes JSON
and optional histogram figures.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.models.vap import VapModel, init_vap
from voiceactivityprojection_tpu.utils.io import write_json
from voiceactivityprojection_tpu.utils.profiling import (
    activation_stats,
    gradient_stats,
    tree_stats,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--state_dict", type=str, default="")
    parser.add_argument("--audio", type=str, default="", help="wav (else noise)")
    parser.add_argument("--seconds", type=float, default=5.0)
    parser.add_argument("--out", type=str, default="model_params_grad.json")
    parser.add_argument("--plot", action="store_true")
    VapConfig.add_argparse_args(parser)
    args = parser.parse_args()

    conf = VapConfig.args_to_conf(args)
    if args.state_dict:
        model = VapModel.from_torch_state_dict(args.state_dict, conf)
    else:
        model = VapModel(conf, init_vap(jax.random.key(0), conf))

    if args.audio:
        from voiceactivityprojection_tpu.ops.audio import load_waveform, mono_to_stereo

        w, _ = load_waveform(args.audio, sample_rate=conf.sample_rate)
        waveform = mono_to_stereo(w[None])
    else:
        n = int(args.seconds * conf.sample_rate)
        waveform = 0.1 * np.random.default_rng(0).normal(size=(1, 2, n)).astype(np.float32)

    # derive the VAD length from the ACTUAL waveform (an --audio file need
    # not match --seconds; a mismatch would crash the loss shape check)
    n_frames_50hz = waveform.shape[-1] * conf.frame_hz // conf.sample_rate
    frames = n_frames_50hz + conf.horizon_frames
    vad = (np.random.default_rng(1).random((1, frames, 2)) < 0.5).astype(np.float32)

    report = {
        "params": tree_stats(model.params, prefix="param/"),
        "activations": activation_stats(model, waveform),
        "gradients": gradient_stats(model, {"waveform": waveform, "vad": vad}),
    }
    write_json(report, args.out)
    print(f"Saved -> {args.out} "
          f"({len(report['params'])} params, {len(report['gradients'])} grads)")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        acts = report["activations"]
        fig, axes = plt.subplots(1, len(acts), figsize=(4 * len(acts), 3))
        for ax, (name, st) in zip(np.atleast_1d(axes), acts.items()):
            centers = 0.5 * (np.array(st["bin_edges"][:-1]) + np.array(st["bin_edges"][1:]))
            ax.bar(centers, st["hist"], width=np.diff(st["bin_edges"]))
            ax.set_title(name, fontsize=8)
        fig.tight_layout()
        fig_path = args.out.replace(".json", ".png")
        fig.savefig(fig_path, dpi=100)
        print(f"Saved -> {fig_path}")


if __name__ == "__main__":
    main()
