"""Offline VAP inference CLI (mirrors reference run.py:190-279).

Usage:
    python run.py -a audio.wav [-sd state_dict.pt] [-o out.json]
                  [--vad_list vad.json] [--plot] [--chunk]

Loads a stereo (or mono -> silent-channel) waveform, runs the model,
writes a JSON of output tensors, optionally plots. Audio longer than 160 s
is automatically processed with chunked sliding-window extraction
(run.py:222-229).
"""

from __future__ import annotations

import argparse
import os
from os.path import basename

import numpy as np
import jax
import jax.numpy as jnp

# this image's site hook pins the TPU platform regardless of JAX_PLATFORMS;
# VAP_PLATFORM=cpu forces CPU (used by tests/headless runs)
from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.inference.extraction import (
    MAX_SINGLE_SHOT_TIME,
    VapExtractor,
)
from voiceactivityprojection_tpu.models.vap import VapModel
from voiceactivityprojection_tpu.ops.audio import load_waveform, mono_to_stereo
from voiceactivityprojection_tpu.ops.vad import vad_list_to_onehot
from voiceactivityprojection_tpu.utils.io import read_json, write_json, tensor_dict_to_json


def get_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="VAP offline inference")
    parser.add_argument("-a", "--audio", type=str, required=True, help="wav path")
    parser.add_argument(
        "-sd", "--state_dict", type=str, default="",
        help="torch state-dict (.pt) or legacy Lightning ckpt to import",
    )
    parser.add_argument(
        "--checkpoint", type=str, default="",
        help="orbax checkpoint dir (e.g. runs/<name>/ckpt_best)",
    )
    parser.add_argument(
        "-o", "--output", type=str, default="",
        help="output json path (default: <audio>.json)",
    )
    parser.add_argument("--vad_list", type=str, default="", help="vad_list json")
    parser.add_argument("--chunk", action="store_true", help="force chunked extraction")
    parser.add_argument("--chunk_time", type=float, default=25.0)
    parser.add_argument("--step_time", type=float, default=5.0)
    parser.add_argument(
        "--context_parallel",
        action="store_true",
        help="shard the time axis over all devices for one EXACT single-shot "
        "pass (no chunk-seam approximation) — long audio on a multi-chip mesh",
    )
    parser.add_argument("--plot", action="store_true")
    parser, _ = VapConfig.add_argparse_args(parser), None
    return parser.parse_args()


def main() -> None:
    args = get_args()
    conf = VapConfig.args_to_conf(args)

    if args.state_dict:
        model = VapModel.from_torch_state_dict(args.state_dict, conf)
        print(f"Loaded state dict: {args.state_dict}")
    elif args.checkpoint:
        from voiceactivityprojection_tpu.models.checkpoint import restore_checkpoint
        from voiceactivityprojection_tpu.models.vap import init_vap

        model = VapModel(conf, init_vap(jax.random.key(0), conf))
        model.params = restore_checkpoint(
            os.path.abspath(args.checkpoint), {"params": model.params}
        )["params"]
        print(f"Restored checkpoint: {args.checkpoint}")
    else:
        model = VapModel.init(jax.random.key(0), conf)
        print("WARNING: random-init weights (no --state_dict given)")

    waveform, sr = load_waveform(args.audio, sample_rate=conf.sample_rate)
    duration = waveform.shape[-1] / sr
    waveform = mono_to_stereo(waveform[None])  # (1, 2, n)
    print(f"Audio: {args.audio} ({duration:.1f} s, {waveform.shape})")

    vad = None
    if args.vad_list:
        vl = read_json(args.vad_list)
        horizon = model.conf.horizon_time
        vad = vad_list_to_onehot(
            vl, duration=duration + horizon, frame_hz=conf.frame_hz
        )[None]

    extractor = VapExtractor(
        model,
        context_time=args.chunk_time - args.step_time,
        step_time=args.step_time,
    )
    if args.context_parallel:
        from voiceactivityprojection_tpu.parallel.context import (
            pad_waveform_for_mesh,
            probs_context_parallel,
        )
        from voiceactivityprojection_tpu.models.encoder import TOTAL_DOWNSAMPLE
        from voiceactivityprojection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=len(jax.devices()))
        t50 = waveform.shape[-1] // TOTAL_DOWNSAMPLE
        wav = pad_waveform_for_mesh(jnp.asarray(waveform), mesh.shape["data"])
        out = probs_context_parallel(model.params, wav, model.conf, mesh)
        out = {k: v[:, :t50] if v.ndim >= 2 else v for k, v in out.items()}
        print(
            f"Context-parallel single shot over {mesh.shape['data']} devices: "
            f"{out['p_now'].shape[1]} frames"
        )
    elif args.chunk or duration > MAX_SINGLE_SHOT_TIME:
        out = extractor.step_extraction(waveform, vad=vad)
        print(f"Chunked extraction: {out['p_now'].shape[1]} frames")
    else:
        out = extractor.extract(waveform, vad=vad)
        print(f"Single shot: {out['p_now'].shape[1]} frames")

    savepath = args.output or basename(args.audio).replace(".wav", ".json")
    data = tensor_dict_to_json({k: np.asarray(v) for k, v in out.items()})
    write_json(data, savepath)
    print(f"Saved output -> {savepath}")

    if args.plot:
        from voiceactivityprojection_tpu.utils.plot import plot_stereo

        fig_path = savepath.replace(".json", ".png")
        plot_stereo(
            waveform[0], p_now=out["p_now"][0], p_future=out["p_future"][0],
            vad=out["vad"][0], savepath=fig_path,
        )
        print(f"Saved figure -> {fig_path}")


if __name__ == "__main__":
    main()
