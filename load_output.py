"""Load and inspect the JSON written by run.py
(mirrors reference load_stereo.py:1-47).

    python load_output.py out.json
"""

from __future__ import annotations

import sys

import numpy as np

from voiceactivityprojection_tpu.utils.io import read_json


def load_np(path: str) -> dict:
    d = read_json(path)
    for k, v in d.items():
        if k == "vad_list":
            continue
        d[k] = np.array(v)
    return d


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print("usage: python load_output.py <output.json>")
        sys.exit(0)
    path = sys.argv[1]
    d = load_np(path)
    print("-" * 50)
    print(path)
    print("-" * len(path))
    for k, v in d.items():
        if isinstance(v, np.ndarray):
            print(f"{k}: {tuple(v.shape)} {v.dtype}")
        else:
            print(f"{k}: {type(v).__name__}")
    print("-" * 50)
