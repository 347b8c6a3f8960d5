"""Training CLI (mirrors reference vap/train.py:99-240).

    python train.py --data_train_path train.csv --data_val_path val.csv \
                    [--vap_* ...] [--opt_* ...] [--event_* ...] \
                    [--max_epochs N] [--mono]

Manifest CSV columns: audio_path,vad_path[,start,end] (see
voiceactivityprojection_tpu/data/dataset.py).
"""

from __future__ import annotations

import argparse
import os

import jax

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.config import (
    DataConfig,
    EventConfig,
    OptConfig,
    VapConfig,
    VapMonoConfig,
)
from voiceactivityprojection_tpu.train.loop import Trainer


def get_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="VAP training")
    parser.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize(): the mesh then spans all "
             "hosts (gradient psum over ICI within a slice, DCN across)",
    )
    parser.add_argument("--max_epochs", type=int, default=100)
    parser.add_argument("--resume_from", type=str, default="",
                        help="orbax checkpoint dir (e.g. runs/.../ckpt_last)"
                             " to resume from: restores params + optimizer "
                             "moments + LR + epoch + plateau/early-stop "
                             "counters + host PRNGs (exact continuation); "
                             "legacy params-only checkpoints load params "
                             "with fresh optimizer state")
    parser.add_argument("--init_encoder_from", type=str, default="",
                        help="pretrain_cpc.py checkpoint dir (cpc_encoder) "
                             "to graft into fresh VAP params")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out_dir", type=str, default="runs")
    parser.add_argument("--n_devices", type=int, default=0, help="0 = all")
    parser.add_argument("--limit_batches", type=int, default=0, help="debug cap")
    parser.add_argument("--mono", action="store_true")
    # --mono switches the registered --vap_* surface to the mono config's
    # SUPERSET (adds va_history/va_history_bins, reference
    # model.py:82-122); scanned from argv because argparse must know the
    # field set before parsing
    import sys

    conf_cls = VapMonoConfig if "--mono" in sys.argv[1:] else VapConfig
    conf_cls.add_argparse_args(parser)
    OptConfig.add_argparse_args(parser)
    DataConfig.add_argparse_args(parser)
    EventConfig.add_argparse_args(parser)
    return parser.parse_args()


def main() -> None:
    args = get_args()
    if args.multihost:
        jax.distributed.initialize()
        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    conf_cls = VapMonoConfig if args.mono else VapConfig
    trainer = Trainer(
        model_conf=conf_cls.args_to_conf(args),
        opt_conf=OptConfig.args_to_conf(args),
        data_conf=DataConfig.args_to_conf(args),
        event_conf=EventConfig.args_to_conf(args),
        max_epochs=args.max_epochs,
        seed=args.seed,
        out_dir=args.out_dir,
        n_devices=args.n_devices or None,
        limit_batches=args.limit_batches or None,
    )
    print(f"Run: {trainer.name} -> {trainer.out_dir}")
    print(f"Mesh: {dict(trainer.mesh.shape)}")
    trainer.fit(
        resume_from=args.resume_from or None,
        init_encoder_from=args.init_encoder_from or None,
    )


if __name__ == "__main__":
    main()
