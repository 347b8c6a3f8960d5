"""Interactive stereo-output browser (streamlit; mirrors reference
analyzes/interface_stereo.py:1-113).

    streamlit run analyzes/interface_stereo.py -- --manifest data.csv
        [--state_dict sd.pt | --checkpoint dir]

Browses manifest windows, shows mel + VAD + p_now/p_future panels for the
selected sample. Falls back to a batch PNG export mode when streamlit is
not installed:

    python analyzes/interface_stereo.py --manifest data.csv --export out_dir
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.data.dataset import SlidingWindowDataset
from voiceactivityprojection_tpu.models.vap import VapModel
from voiceactivityprojection_tpu.utils.plot import plot_stereo


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", type=str, required=True)
    parser.add_argument("--state_dict", type=str, default="")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--audio_duration", type=float, default=20.0)
    parser.add_argument("--export", type=str, default="", help="PNG export dir")
    parser.add_argument("--limit", type=int, default=5)
    VapConfig.add_argparse_args(parser)
    return parser.parse_args()


def load_model(args) -> VapModel:
    return VapModel.from_args(args)


def sample_figure(model, item):
    import jax.numpy as jnp

    out = model.probs(jnp.asarray(item["waveform"][None]))
    return plot_stereo(
        item["waveform"],
        p_now=np.asarray(out["p_now"])[0],
        p_future=np.asarray(out["p_future"])[0],
        vad=np.asarray(out["vad"])[0],
    )


def run_streamlit(args) -> None:
    import streamlit as st

    st.title("VAP stereo browser")
    model = load_model(args)
    ds = SlidingWindowDataset(args.manifest, audio_duration=args.audio_duration)
    idx = st.slider("window", 0, max(len(ds) - 1, 0), 0)
    item = ds[idx]
    st.text(f"{item['session']}")
    fig, _ = sample_figure(model, item)
    st.pyplot(fig)


def run_export(args) -> None:
    model = load_model(args)
    ds = SlidingWindowDataset(args.manifest, audio_duration=args.audio_duration)
    os.makedirs(args.export, exist_ok=True)
    for i in range(min(len(ds), args.limit)):
        item = ds[i]
        fig, _ = sample_figure(model, item)
        path = os.path.join(args.export, f"window_{i:04d}.png")
        fig.savefig(path, dpi=100)
        print(f"Saved -> {path}")


if __name__ == "__main__":
    args = get_args()
    if args.export:
        run_export(args)
    else:
        try:  # only the availability probe — a missing dependency inside
            # run_streamlit must surface as itself, not as this message
            import streamlit  # noqa: F401
        except ImportError:
            print("streamlit not installed; use --export DIR for PNG mode")
            sys.exit(1)
        run_streamlit(args)
