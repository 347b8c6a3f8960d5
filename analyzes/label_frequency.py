"""Projection-label frequency extraction over a corpus
(mirrors reference analyzes/model_params_grad.py:90-113).

    python analyzes/label_frequency.py --manifest data.csv [--out labels.json]

Computes the histogram of the 256 projection-window classes over all VAD
windows in a manifest — useful for class-imbalance analysis and priors.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

import jax.numpy as jnp

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.data.dataset import SlidingWindowDataset
from voiceactivityprojection_tpu.ops.codebook import codebook_matrix, get_labels
from voiceactivityprojection_tpu.utils.io import write_json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", type=str, required=True)
    parser.add_argument("--audio_duration", type=float, default=20.0)
    parser.add_argument("--out", type=str, default="label_frequency.json")
    parser.add_argument("--top", type=int, default=20)
    VapConfig.add_argparse_args(parser)
    args = parser.parse_args()

    conf = VapConfig.args_to_conf(args)
    ds = SlidingWindowDataset(
        args.manifest, audio_duration=args.audio_duration,
        horizon=conf.horizon_time,
    )
    counts = np.zeros(conf.n_classes, dtype=np.int64)
    # batch windows per dispatch: one device round trip costs ~28 ms over
    # the dev tunnel, so per-window get_labels would dominate on big corpora
    BATCH = 256
    for i in range(0, len(ds), BATCH):
        vads = np.stack(
            [ds[j]["vad"] for j in range(i, min(i + BATCH, len(ds)))]
        )
        labels = np.asarray(get_labels(jnp.asarray(vads), conf.bin_frames))
        counts += np.bincount(labels.ravel(), minlength=conf.n_classes)

    total = int(counts.sum())
    states = codebook_matrix(len(conf.bin_times))
    order = np.argsort(counts)[::-1]
    print(f"{len(ds)} windows, {total} label frames")
    print(f"top {args.top} classes:")
    for idx in order[: args.top]:
        bits = states[idx].astype(int).tolist()
        print(f"  class {idx:3d}  {counts[idx]:8d} ({counts[idx]/total:6.2%})  A={bits[0]} B={bits[1]}")

    write_json(
        {
            "counts": counts.tolist(),
            "total": total,
            "n_windows": len(ds),
            "entropy_bits": float(
                -(counts[counts > 0] / total * np.log2(counts[counts > 0] / total)).sum()
            ),
        },
        args.out,
    )
    print(f"Saved -> {args.out}")


if __name__ == "__main__":
    main()
