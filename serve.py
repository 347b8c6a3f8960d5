"""Inference server CLI.

Two modes:
* batch (default): one-shot requests micro-batched into fixed-shape
  forwards.
* stream: live dialog sessions on a BatchedKVStreamer — every tick
  advances all sessions one hop in a single dispatch (O(1) transformer
  work per frame per stream).

    python serve.py [-sd state_dict.pt | --checkpoint dir]
        [--port 5590] [--batch_size 16] [--chunk_time 20] [--max_wait_ms 25]
    python serve.py --mode stream [--streams 16] [--context_time 20]
        [--hop_frames 1]

Client usage:
    from voiceactivityprojection_tpu.inference.server import (
        VapClient, VapStreamClient)
    out = VapClient(port=5590).infer(waveform)        # (2, n) float32
    c = VapStreamClient(port=5590); c.open()
    out = c.push(chunk)                               # (2, hop*320) float32
"""

from __future__ import annotations

import argparse

import jax

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.inference.server import VapServer
from voiceactivityprojection_tpu.models.vap import VapModel, init_vap


def main() -> None:
    parser = argparse.ArgumentParser(description="VAP batched inference server")
    parser.add_argument("-sd", "--state_dict", type=str, default="")
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--port", type=int, default=5590)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--chunk_time", type=float, default=20.0)
    parser.add_argument("--max_wait_ms", type=float, default=25.0)
    parser.add_argument("--mode", choices=["batch", "stream"], default="batch")
    parser.add_argument(
        "--streams", type=int, default=16,
        help="concurrent dialog slots per dispatch; measured v5e frontier: "
        "~0.13 ms/stream-hop sustained through 256 streams, real-time "
        "(50 hops/s per dialog) feasible through ~128 streams/chip",
    )
    parser.add_argument("--context_time", type=float, default=20.0)
    parser.add_argument("--hop_frames", type=int, default=1)
    VapConfig.add_argparse_args(parser)
    args = parser.parse_args()

    conf = VapConfig.args_to_conf(args)
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

    if args.mode == "stream":
        from voiceactivityprojection_tpu.inference.server import VapStreamServer

        server = VapStreamServer(
            model,
            streams=args.streams,
            context_time=args.context_time,
            hop_frames=args.hop_frames,
            max_wait_ms=args.max_wait_ms,
        )
        print(
            f"Stream-serving on tcp://*:{args.port} "
            f"({args.streams} sessions x {args.context_time}s context, "
            f"hop {args.hop_frames} frames, wait {args.max_wait_ms}ms)"
        )
    else:
        server = VapServer(
            model,
            batch_size=args.batch_size,
            chunk_time=args.chunk_time,
            max_wait_ms=args.max_wait_ms,
        )
        print(
            f"Serving on tcp://*:{args.port} "
            f"(batch {args.batch_size} x {args.chunk_time}s, wait {args.max_wait_ms}ms)"
        )
    server.serve(port=args.port)


if __name__ == "__main__":
    main()
