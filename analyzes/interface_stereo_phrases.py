"""Interactive phrases-corpus browser (streamlit; mirrors reference
analyzes/interface_stereo_phrases.py:1-101).

    streamlit run analyzes/interface_stereo_phrases.py -- \
        [--state_dict sd.pt | --checkpoint dir] [--phrases_root /root/reference]

Select phrase/length/gender/voice; shows the phrase figure with word
alignments, EOT/SCP markers and p_now/p_future panels. Headless PNG mode:

    python analyzes/interface_stereo_phrases.py --export out_dir --limit 5
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
from voiceactivityprojection_tpu.data.phrases import DEFAULT_PHRASES_ROOT, PhraseDataset
from voiceactivityprojection_tpu.models.vap import VapModel
from voiceactivityprojection_tpu.ops.codebook import get_probs
from voiceactivityprojection_tpu.utils.plot import plot_phrases_sample


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--state_dict", type=str, default="")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--phrases_root", type=str, default=DEFAULT_PHRASES_ROOT)
    parser.add_argument("--export", type=str, default="")
    parser.add_argument("--limit", type=int, default=5)
    VapConfig.add_argparse_args(parser)
    return parser.parse_args()


def load_model(args) -> VapModel:
    return VapModel.from_args(args)


def sample_figure(model, sample):
    import jax.numpy as jnp

    out = model.forward(jnp.asarray(sample["waveform"][None]))
    probs = get_probs(out["logits"])
    return plot_phrases_sample(
        sample,
        np.asarray(probs["p_now"])[0],
        np.asarray(probs["p_future"])[0],
    )


def run_streamlit(args) -> None:
    import streamlit as st

    st.title("VAP phrases browser")
    model = load_model(args)
    ds = PhraseDataset(root=args.phrases_root)
    df = ds.df
    phrase = st.selectbox("phrase", sorted(df["phrase"].unique()))
    long_short = st.selectbox("length", ["short", "long"])
    gender = st.selectbox("gender", sorted(df["gender"].unique()))
    # the voice range depends on the selected combination — a global max
    # would let the slider address voices that don't exist for it
    subset = df[
        (df["phrase"] == phrase)
        & (df["long_short"] == long_short)
        & (df["gender"] == gender)
    ]
    idx = st.slider("voice", 0, int(subset["phrase_idx"].max()), 0)
    sample = ds.get_sample(phrase, long_short, gender, idx)
    st.text(sample["audio_path"])
    fig, _ = sample_figure(model, sample)
    st.pyplot(fig)


def run_export(args) -> None:
    model = load_model(args)
    ds = PhraseDataset(root=args.phrases_root)
    os.makedirs(args.export, exist_ok=True)
    for i in range(min(len(ds), args.limit)):
        sample = ds[i]
        fig, _ = sample_figure(model, sample)
        name = os.path.basename(sample["audio_path"]).replace(".wav", ".png")
        path = os.path.join(args.export, name)
        fig.savefig(path, dpi=100)
        print(f"Saved -> {path}")


if __name__ == "__main__":
    args = get_args()
    if args.export:
        run_export(args)
    else:
        try:
            run_streamlit(args)
        except ImportError:
            print("streamlit not installed; use --export DIR for PNG mode")
