"""CPC encoder pretraining CLI.

    python pretrain_cpc.py --data_train_path train.csv
        [--window_time 1.28] [--batch_size 32] [--steps 100000]
        [--out_dir cpc_runs]

Trains the conv+GRU encoder with the InfoNCE objective on raw audio
windows (the reference's pretrained-checkpoint dependency is a download we
replace with in-framework pretraining). The result saves as an orbax
checkpoint whose `encoder` subtree drops straight into `VapModel` params
(downsample conv stays randomly initialized and trains with the VAP task).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import jax

from voiceactivityprojection_tpu.utils.runtime import setup_runtime

setup_runtime()

from voiceactivityprojection_tpu.data.dataset import SlidingWindowDataset
from voiceactivityprojection_tpu.models.checkpoint import save_checkpoint
from voiceactivityprojection_tpu.models.encoder import init_encoder
from voiceactivityprojection_tpu.train.cpc_pretrain import (
    init_cpc_heads,
    init_cpc_train_state,
    make_cpc_optimizer,
    make_cpc_train_step,
)


def main() -> None:
    parser = argparse.ArgumentParser(description="CPC pretraining")
    parser.add_argument("--data_train_path", type=str, required=True)
    parser.add_argument("--window_time", type=float, default=1.28,
                        help="CPC_audio sizeWindow 20480 samples")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--steps", type=int, default=100_000)
    parser.add_argument("--learning_rate", type=float, default=2e-4)
    parser.add_argument("--n_predicts", type=int, default=12)
    parser.add_argument("--n_negatives", type=int, default=128)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--save_every", type=int, default=5000)
    parser.add_argument("--out_dir", type=str, default="cpc_runs")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--export_blob", action="store_true",
        help="also write cpc_blob.pt in the libri-light checkpoint format "
        "(consumable by the reference's load_CPC; needs torch)",
    )
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    ds = SlidingWindowDataset(
        args.data_train_path,
        audio_duration=args.window_time,
        horizon=0.0,
        mono=True,
    )
    print(f"{len(ds)} training windows of {args.window_time}s")
    n_samples = ds.n_samples

    key = jax.random.key(args.seed)
    k_enc, k_head, k_loop = jax.random.split(key, 3)
    encoder = init_encoder(k_enc, args.dim)
    heads = init_cpc_heads(k_head, args.n_predicts, args.dim, args.dim)
    tx = make_cpc_optimizer(args.learning_rate)
    state = init_cpc_train_state(encoder, heads, tx)
    step_fn = make_cpc_train_step(tx, args.n_predicts, args.n_negatives)

    rng = np.random.default_rng(args.seed)
    log_path = os.path.join(args.out_dir, "cpc_metrics.jsonl")
    t0 = time.time()

    # threaded decode + one-batch prefetch: the WAV decode/resample releases
    # the GIL in the native library, and loading batch n+1 while the device
    # runs step n keeps the accelerator from idling on host IO
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=4)

    def load_batch():
        idx = rng.integers(0, len(ds), size=args.batch_size)
        items = pool.map(lambda i: ds[int(i)]["waveform"][0, :n_samples], idx)
        return np.stack(list(items))

    next_batch = pool.submit(load_batch)
    with open(log_path, "a") as logf:
        for it in range(args.steps):
            batch = next_batch.result()
            next_batch = pool.submit(load_batch)
            k_loop, k_step = jax.random.split(k_loop)
            state, aux = step_fn(state, batch, k_step)
            if (it + 1) % args.log_every == 0:
                rec = {
                    "step": it + 1,
                    "cpc_loss": float(aux["cpc_loss"]),
                    "cpc_acc": float(aux["cpc_acc"]),
                    "acc_k1": float(aux["cpc_acc_k1"]),
                    "acc_k12": float(aux["cpc_acc_k12"]),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                print(" ".join(f"{k}={v}" for k, v in rec.items()), flush=True)
                logf.write(json.dumps(rec) + "\n")
                logf.flush()
            if (it + 1) % args.save_every == 0 or it + 1 == args.steps:
                path = os.path.abspath(os.path.join(args.out_dir, "cpc_encoder"))
                save_checkpoint(path, {"encoder": state.encoder})
                print(f"saved -> {path}")
                if args.export_blob:
                    # libri-light on-disk format: the reference's own
                    # load_CPC (and our train.py --init_encoder_from) can
                    # consume this encoder directly
                    from voiceactivityprojection_tpu.models.checkpoint import (
                        export_cpc_blob,
                    )

                    blob = os.path.join(args.out_dir, "cpc_blob.pt")
                    export_cpc_blob(state.encoder, blob)
                    print(f"exported blob -> {blob}")


if __name__ == "__main__":
    main()
