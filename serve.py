"""Batched inference server CLI.

    python serve.py [-sd state_dict.pt | --checkpoint dir]
        [--port 5590] [--batch_size 16] [--chunk_time 20] [--max_wait_ms 25]

Client usage:
    from voiceactivityprojection_tpu.inference.server import VapClient
    out = VapClient(port=5590).infer(waveform)   # (2, n) float32
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
