"""Real-time SDS CLI (mirrors reference sds/run_sds.py:162-273).

    python run_sds.py [-sd state_dict.pt] [--wav file.wav] [--port 5578]
        [--context_time 20] [--chunk_time 0.02]

Captures stereo audio (microphone via pyaudio, or --wav playback), runs
incremental VAP inference, and publishes smoothed p_now(A) over ZMQ PUB
topic "tt_probs". Subscribe with:

    python -c "from voiceactivityprojection_tpu.inference.sds import \
zmq_subscriber;
for p in zmq_subscriber(): print(p)"
"""

from __future__ import annotations

import argparse

import jax

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.config import SDSConfig, VapConfig
from voiceactivityprojection_tpu.inference.sds import TurnTakingSDS, WavSource
from voiceactivityprojection_tpu.models.vap import VapModel, init_vap


def main() -> None:
    parser = argparse.ArgumentParser(description="VAP real-time SDS")
    parser.add_argument("-sd", "--state_dict", type=str, default="")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--wav", type=str, default="", help="playback source")
    parser.add_argument("--realtime", action="store_true", help="pace wav playback")
    parser.add_argument("--max_chunks", type=int, default=0)
    SDSConfig.add_argparse_args(parser)
    VapConfig.add_argparse_args(parser)
    args = parser.parse_args()

    conf = VapConfig.args_to_conf(args)
    sds_conf = SDSConfig.args_to_conf(args)

    if args.state_dict:
        model = VapModel.from_torch_state_dict(args.state_dict, conf)
    else:
        model = VapModel(conf, init_vap(jax.random.key(0), conf))
        if args.checkpoint:
            import os

            from voiceactivityprojection_tpu.models.checkpoint import restore_checkpoint

            model.params = restore_checkpoint(
                os.path.abspath(args.checkpoint), {"params": model.params}
            )["params"]
        else:
            print("WARNING: random-init weights")

    sds = TurnTakingSDS(model, sds_conf)
    if args.wav:
        sds.source = WavSource(
            args.wav, sds.stream.hop_samples,
            realtime=args.realtime, sample_rate=sds_conf.sample_rate,
        )
    print(
        f"SDS: context={sds_conf.context_time}s hop={sds.stream.hop_samples} samples "
        f"zmq_port={sds_conf.zmq_port}"
    )
    sds.run(max_chunks=args.max_chunks or None)


if __name__ == "__main__":
    main()
