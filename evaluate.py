"""Evaluation CLI (mirrors reference vap/evaluation.py:245-322).

    python evaluate.py --data_test_path test.csv \
        [--checkpoint runs/.../ckpt_best | --state_dict sd.pt] \
        [--out_dir eval] [--vap_* ...] [--event_* ...]
"""

from __future__ import annotations

import argparse
import os

import jax

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.config import DataConfig, EventConfig, VapConfig
from voiceactivityprojection_tpu.data.dataset import SlidingWindowDataset, VapDataLoader
from voiceactivityprojection_tpu.models.vap import VapModel, init_vap
from voiceactivityprojection_tpu.train.evaluation import evaluate


def main() -> None:
    parser = argparse.ArgumentParser(description="VAP evaluation")
    parser.add_argument("--checkpoint", type=str, default="", help="orbax ckpt dir")
    parser.add_argument("--state_dict", type=str, default="", help="torch .pt import")
    parser.add_argument(
        "--allow_random_init", action="store_true",
        help="evaluate RANDOM-INIT weights (smoke tests only). Without "
        "this flag the CLI refuses to run when neither --checkpoint nor "
        "--state_dict is given — a typo'd checkpoint path must not "
        "silently produce garbage metrics CSVs (the reference hard-"
        "requires a checkpoint, vap/evaluation.py:255-262)",
    )
    parser.add_argument("--out_dir", type=str, default="eval")
    parser.add_argument("--limit_batches", type=int, default=0)
    parser.add_argument("--no_threshold_search", action="store_true")
    parser.add_argument(
        "--thresholds", type=str, default="",
        help="thresholds.json from a previous --out_dir (found on the val "
        "split) to APPLY at test time — the reference's find-on-one-split "
        "/ apply-at-test flow (evaluation.py:245-322)",
    )
    VapConfig.add_argparse_args(parser)
    DataConfig.add_argparse_args(parser)
    EventConfig.add_argparse_args(parser)
    args = parser.parse_args()

    conf = VapConfig.args_to_conf(args)
    data_conf = DataConfig.args_to_conf(args)
    event_conf = EventConfig.args_to_conf(args)
    assert data_conf.test_path, "--data_test_path is required"

    if args.state_dict:
        model = VapModel.from_torch_state_dict(args.state_dict, conf)
    else:
        model = VapModel(conf, init_vap(jax.random.key(0), conf))
        if args.checkpoint:
            from voiceactivityprojection_tpu.models.checkpoint import restore_checkpoint

            restored = restore_checkpoint(
                os.path.abspath(args.checkpoint), {"params": model.params}
            )
            model.params = restored["params"]
            print(f"Restored checkpoint: {args.checkpoint}")
        else:
            if not args.allow_random_init:
                parser.error(
                    "no weights given: pass --checkpoint or --state_dict "
                    "(or --allow_random_init for an explicit smoke run)"
                )
            print("WARNING: random-init weights (--allow_random_init)")

    loader = VapDataLoader(
        SlidingWindowDataset(
            data_conf.test_path,
            audio_duration=data_conf.audio_duration,
            horizon=data_conf.horizon_time,
            sample_rate=data_conf.sample_rate,
            frame_hz=data_conf.frame_hz,
        ),
        batch_size=data_conf.batch_size,
        shuffle=False,
        # evaluation must see every window: keep the ragged tail batch
        drop_last=False,
    )
    thresholds = None
    if args.thresholds:
        from voiceactivityprojection_tpu.utils.io import read_json

        thresholds = read_json(args.thresholds)
        print(f"Applying transferred thresholds: {thresholds}")
    from voiceactivityprojection_tpu.data.phrases import make_phrase_probe

    probe = make_phrase_probe(data_conf)
    if probe is not None:
        print(f"Phrase probe: {len(probe.dset)} samples")
    result = evaluate(
        model, loader, event_conf,
        out_dir=args.out_dir,
        limit_batches=args.limit_batches or None,
        threshold_search=not args.no_threshold_search,
        thresholds=thresholds,
        phrase_probe=probe,
    )
    for k, v in result.items():
        print(f"{k}: {v}")
    print(f"Saved -> {args.out_dir}/metrics.csv")


if __name__ == "__main__":
    main()
