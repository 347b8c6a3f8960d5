"""Interactive phrases browser (streamlit; mirrors reference
analyzes/interface_stereo_phrases.py:1-101): pick (phrase, long/short,
gender, voice idx), run the model on the padded phrase sample, show the
stereo panel (waveform + VAD + p_now/p_future) — optionally under a
prosodic permutation (flat_f0 / flat_intensity / ..., the
evaluate_phrases.py probe surface).

    streamlit run analyzes/interface_stereo_phrases.py -- \
        [--state_dict sd.pt | --checkpoint dir] [--phrases_root ROOT]

Falls back to a batch PNG export mode when streamlit is not installed:

    python analyzes/interface_stereo_phrases.py --export out_dir --limit 4
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
from voiceactivityprojection_tpu.data.phrases import (
    DEFAULT_PHRASES_ROOT,
    PhraseDataset,
)
from voiceactivityprojection_tpu.models.vap import VapModel
from voiceactivityprojection_tpu.utils.plot import plot_stereo

PERMUTATIONS = (
    "regular", "flat_f0", "only_f0", "shift_f0_up", "shift_f0_down",
    "flat_intensity", "duration_avg",
)


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--state_dict", type=str, default="")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--phrases_root", type=str, default=DEFAULT_PHRASES_ROOT)
    parser.add_argument("--export", type=str, default="", help="PNG export dir")
    parser.add_argument("--limit", type=int, default=4)
    parser.add_argument("--permutation", type=str, default="regular",
                        choices=PERMUTATIONS)
    VapConfig.add_argparse_args(parser)
    # streamlit passes its own argv after `--`; tolerate unknowns
    args, _ = parser.parse_known_args()
    return args


def _permute(item, permutation: str) -> np.ndarray:
    """Apply one prosodic permutation to the active channel — the same
    `permute_waveform` the probe CLI uses (evaluate_phrases.py:61-83,
    reference evaluation_phrases.py:32-142)."""
    if permutation == "regular":
        return item["waveform"]
    from evaluate_phrases import permute_waveform

    out = np.array(item["waveform"])
    y = permute_waveform(
        permutation, np.asarray(out[0], np.float64), item
    ).astype(np.float32)
    n = min(len(y), out.shape[-1])
    out[0, :n] = y[:n]
    out[0, n:] = 0.0
    return out


def sample_figure(model, item, permutation: str):
    import jax.numpy as jnp

    w = _permute(item, permutation)
    out = model.probs(jnp.asarray(w[None]))
    fig, axs = plot_stereo(
        w,
        p_now=np.asarray(out["p_now"])[0],
        p_future=np.asarray(out["p_future"])[0],
        vad=np.asarray(out["vad"])[0],
    )
    return fig


def run_streamlit(args) -> None:
    import streamlit as st

    st.title("VAP Phrases")
    model = VapModel.from_args(args)
    ds = PhraseDataset(root=args.phrases_root)
    c1, c2, c3, c4, c5 = st.columns([2, 1, 1, 1, 2])
    phrase = c1.selectbox("phrase", sorted(ds.df["phrase"].unique()))
    longshort = c2.selectbox("length", ["short", "long"])
    gender = c3.selectbox("gender", ["female", "male"])
    # voice choices derived from the SELECTED combination — a global range
    # would let the slider address voices absent from a non-reference corpus
    m = ds.df
    voices = sorted(
        m.loc[
            (m["phrase"] == phrase)
            & (m["long_short"] == longshort)
            & (m["gender"] == gender),
            "phrase_idx",
        ].unique()
    )
    if not voices:  # non-reference corpora may lack a combination entirely
        st.warning(
            f"no samples for {phrase}/{longshort}/{gender} in this corpus"
        )
        st.stop()
    idx = c4.selectbox("voice idx", voices)
    permutation = c5.selectbox("permutation", list(PERMUTATIONS))
    item = ds.get_sample(phrase, longshort, gender, int(idx))
    st.text(os.path.basename(item["audio_path"]))
    fig = sample_figure(model, item, permutation)
    st.pyplot(fig)


def run_export(args) -> None:
    model = VapModel.from_args(args)
    ds = PhraseDataset(root=args.phrases_root)
    os.makedirs(args.export, exist_ok=True)
    for i in range(min(len(ds), args.limit)):
        item = ds[i]
        fig = sample_figure(model, item, args.permutation)
        name = (
            f"{item['phrase']}_{item['long_short']}_{item['gender']}_"
            f"{item['phrase_idx']}_{args.permutation}.png"
        )
        fig.savefig(os.path.join(args.export, name), dpi=100)
        print(f"saved {name}")


if __name__ == "__main__":
    args = get_args()
    if args.export:
        run_export(args)
    else:
        try:  # only the availability probe — run_streamlit's own import
            import streamlit  # noqa: F401
        except ImportError:
            print("streamlit not installed; use --export DIR for PNGs")
            sys.exit(1)
        run_streamlit(args)
