"""Training harness: the Lightning-free equivalent of VAPModel + Trainer
(reference: vap/train.py:147-240, 360-462).

Per epoch:
  train: channel-flip + augmentation -> sharded train_step (data-parallel
         over the mesh) -> running loss
  val:   eval_step losses + host-side event extraction -> event Accuracy/F1
         (vap/train.py:405-462 semantics)
  then:  ReduceLROnPlateau on val_loss, best-checkpoint save (orbax),
         EarlyStopping (vap/train.py:187-199).

Logging: JSONL (one record per epoch) + stdout — the W&B-equivalent
observability surface, offline-first.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import (
    DataConfig,
    EventConfig,
    OptConfig,
    VapConfig,
)
from voiceactivityprojection_tpu.data.dataset import SlidingWindowDataset, VapDataLoader
from voiceactivityprojection_tpu.events.events import TurnTakingEvents
from voiceactivityprojection_tpu.events.metrics import (
    EventMetrics,
    extract_prediction_and_targets,
)
from voiceactivityprojection_tpu.models.checkpoint import save_checkpoint
from voiceactivityprojection_tpu.models.vap import init_vap
from voiceactivityprojection_tpu.ops.codebook import get_probs
from voiceactivityprojection_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from voiceactivityprojection_tpu.train.augment import Augmentation
from voiceactivityprojection_tpu.train.step import (
    EarlyStopping,
    ReduceLROnPlateau,
    TrainState,
    get_learning_rate,
    init_train_state,
    make_eval_step,
    make_optimizer,
    set_learning_rate,
)


def run_name(conf: VapConfig, data_conf: Optional[DataConfig] = None) -> str:
    """Architecture-encoding run name (vap/train.py:137-144); the `ad`
    segment is the REAL configured audio duration like the reference's
    `configs['data'].audio_duration`, formatted the same way (a float
    prints as e.g. 'ad20.0s' there; we keep integers clean)."""
    ad = data_conf.audio_duration if data_conf is not None else 20.0
    ad = int(ad) if float(ad).is_integer() else ad
    return (
        f"VapGPT_{conf.frame_hz}Hz_ad{ad}s_{conf.channel_layers}"
        f"{conf.cross_layers}{conf.num_heads}"
    )


class JsonlLogger:
    """stdout + JSONL metrics sink; optional W&B mirror.

    The reference logs through Lightning's WandbLogger (project "VapGPT",
    run name encoding the architecture, vap/train.py:206-211). wandb is not
    in this image; when `VAP_WANDB=1` and the package imports, every record
    is mirrored to a wandb run with the same project/name semantics —
    otherwise JSONL is the durable log.
    """

    def __init__(self, path: Optional[str], run_name: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self.f = open(path, "a")
        else:
            self.f = None
        self.wandb = None
        if os.environ.get("VAP_WANDB") == "1":
            try:
                import wandb  # type: ignore

                self.wandb = wandb.init(
                    project=os.environ.get("VAP_WANDB_PROJECT", "VapGPT"),
                    name=run_name,
                    resume="allow",
                )
            except Exception as e:  # package absent or init failure: JSONL only
                print(f"wandb mirror disabled: {e}", flush=True)

    def log(self, record: Dict) -> None:
        msg = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
        )
        print(msg, flush=True)
        if self.f:
            self.f.write(json.dumps(record) + "\n")
            self.f.flush()
        if self.wandb is not None:
            step = record.get("step")
            self.wandb.log(
                {k: v for k, v in record.items() if isinstance(v, (int, float))},
                step=step if isinstance(step, int) else None,
            )

    def close(self):
        if self.f:
            self.f.close()
        if self.wandb is not None:
            self.wandb.finish()


class Trainer:
    def __init__(
        self,
        model_conf: Optional[VapConfig] = None,
        opt_conf: Optional[OptConfig] = None,
        data_conf: Optional[DataConfig] = None,
        event_conf: Optional[EventConfig] = None,
        max_epochs: int = 100,
        seed: int = 0,
        out_dir: str = "runs",
        n_devices: Optional[int] = None,
        limit_batches: Optional[int] = None,
    ):
        self.model_conf = model_conf or VapConfig()
        self.opt_conf = opt_conf or OptConfig()
        self.data_conf = data_conf or DataConfig()
        self.event_conf = event_conf or EventConfig()
        self.max_epochs = max_epochs
        self.seed = seed
        self.limit_batches = limit_batches

        self.name = run_name(self.model_conf, self.data_conf)
        self.out_dir = os.path.join(out_dir, self.name)
        os.makedirs(self.out_dir, exist_ok=True)
        self.logger = JsonlLogger(
            os.path.join(self.out_dir, "metrics.jsonl"), run_name=self.name
        )

        self.mono = bool(getattr(self.model_conf, "mono", False))
        self.mesh = make_mesh(n_data=n_devices)
        self.tx = make_optimizer(self.opt_conf, self.model_conf.freeze_encoder)
        from voiceactivityprojection_tpu.train.step import (
            make_eval_step_mono,
            make_train_step_augmented,
        )

        self.augment = Augmentation(
            seed=seed,
            pitch_mode=self.data_conf.pitch_mode,
            probability=self.data_conf.augment_probability,
        )
        # fused augment+train step: one dispatch per step (see
        # make_train_step_augmented's measured motivation)
        self.train_step = make_train_step_augmented(
            self.model_conf,
            self.tx,
            mono=self.mono,
            do_flip=bool(self.data_conf.flip_channels) and not self.mono,
            flip_prob=self.data_conf.flip_probability,
            do_mask=bool(self.data_conf.mask_vad) and not self.mono,
            mask_prob=self.data_conf.mask_vad_probability,
            noise_amplitude=self.augment.noise_amplitude,
            sample_rate=self.data_conf.sample_rate,
            frame_hz=self.data_conf.frame_hz,
            # vocoder mode: the tempo-preserving pitch shift runs on
            # device inside the fused step (ops/pitchshift.py); host
            # pitch modes pass () so the branch isn't traced
            pitch_steps=(
                self.augment.pitch_steps
                if self.augment.pitch_mode == "vocoder"
                else ()
            ),
        )
        self.eval_step = (
            make_eval_step_mono(self.model_conf)
            if self.mono
            else make_eval_step(self.model_conf)
        )
        self.event_extractor = TurnTakingEvents(self.event_conf, seed=seed)
        self.plateau = ReduceLROnPlateau(
            factor=self.opt_conf.lr_scheduler_factor,
            patience=self.opt_conf.lr_scheduler_patience,
        )
        self.early_stop = EarlyStopping(patience=self.opt_conf.patience)
        self._phrase_probe = "unset"  # built lazily at first validate()

    def phrase_probe(self):
        """Phrase-probe callback instance or None (reference PhrasesCallback
        at every val epoch, vap/train.py:202); see
        data/phrases.make_phrase_probe for the gating."""
        if self._phrase_probe == "unset":
            from voiceactivityprojection_tpu.data.phrases import (
                make_phrase_probe,
            )

            self._phrase_probe = make_phrase_probe(
                self.data_conf, mono=self.mono
            )
        return self._phrase_probe

    # ------------------------------------------------------------------
    def make_loaders(self):
        dc = self.data_conf
        # mono-model VAD-history conditioning (vah): derived by the loader
        # from the session vad (the reference external DataModule's
        # vad_history feature, vap/train_mono.py:156-163)
        va_history = self.mono and bool(
            getattr(self.model_conf, "va_history", False)
        )
        if va_history:
            bins = int(getattr(self.model_conf, "va_history_bins", 5))
            assert len(dc.va_history_times) + 1 == bins, (
                f"va_history_bins={bins} requires "
                f"{bins - 1} va_history_times, got {dc.va_history_times}"
            )
        mk = lambda path, shuffle: VapDataLoader(
            SlidingWindowDataset(
                path,
                audio_duration=dc.audio_duration,
                horizon=dc.horizon_time,
                sample_rate=dc.sample_rate,
                frame_hz=dc.frame_hz,
                mono=self.mono,
                va_history=va_history,
                va_history_times=dc.va_history_times,
            ),
            batch_size=dc.batch_size,
            shuffle=shuffle,
            # evaluation must see every window: keep the ragged tail batch
            # (costs one extra eval_step compile for the smaller shape);
            # training drops it for static shapes + unbiased step stats
            drop_last=shuffle,
            seed=self.seed,
        )
        train = mk(dc.train_path, True) if dc.train_path else None
        val = mk(dc.val_path, False) if dc.val_path else None
        return train, val

    # ------------------------------------------------------------------
    def find_lr(
        self,
        train_loader,
        params,
        min_lr: float = 1e-7,
        max_lr: float = 1.0,
        num_steps: int = 100,
        smoothing: float = 0.98,
        diverge_factor: float = 4.0,
    ) -> Dict:
        """LR-range test: the reference optionally runs Lightning's
        `trainer.tuner.lr_find` and adopts the suggestion
        (vap/train.py:222-223). Same procedure, on a THROWAWAY copy of the
        optimizer state: sweep LR exponentially from min_lr to max_lr over
        num_steps training batches, record the bias-corrected
        exponentially-smoothed loss, stop early when it exceeds
        diverge_factor x the best seen, and suggest the LR at the steepest
        descent (argmin of the loss curve's gradient, skipping the noisy
        head and the divergence tail). Sweeps a DEEP COPY of params: the
        train step donates its state, which would otherwise delete the
        caller's param buffers along with the discarded sweep state."""
        params = jax.tree.map(jnp.copy, params)
        state = replicate_tree(init_train_state(params, self.tx), self.mesh)
        key = jax.device_put(jax.random.key(self.seed + 2))
        lrs, smooth = [], []
        avg, best = 0.0, float("inf")
        step = 0
        diverged = False
        while step < num_steps and not diverged:
            progressed = False
            for batch in train_loader:
                if step >= num_steps:
                    break
                progressed = True
                lr = float(
                    min_lr * (max_lr / min_lr) ** (step / max(1, num_steps - 1))
                )
                state = set_learning_rate(state, lr)
                semis, choice = self.augment.plan()
                if semis is not None:
                    batch = dict(batch)
                    batch["waveform"] = self.augment.apply_pitch_host(
                        np.asarray(batch["waveform"]), semis
                    )
                sharded = shard_batch(
                    {k: np.asarray(v) for k, v in batch.items()}, self.mesh
                )
                state, metrics = self.train_step(state, sharded, key, choice)
                loss = float(metrics["loss"])  # tuner: per-step fetch is fine
                step += 1
                if not np.isfinite(loss):
                    diverged = True
                    break
                avg = smoothing * avg + (1.0 - smoothing) * loss
                corrected = avg / (1.0 - smoothing**step)
                lrs.append(lr)
                smooth.append(corrected)
                best = min(best, corrected)
                if step > 10 and corrected > diverge_factor * best:
                    diverged = True
                    break
            if not progressed:
                break
        if len(smooth) < 3:
            return {"suggestion": self.opt_conf.learning_rate,
                    "lrs": lrs, "losses": smooth}
        head = min(10, len(smooth) // 3)  # skip pre-descent noise
        grad = np.gradient(np.asarray(smooth))
        idx = head + int(np.argmin(grad[head : len(grad) - 1]))
        result = {"suggestion": float(lrs[idx]), "lrs": lrs, "losses": smooth}
        self.logger.log(
            {"lr_find": {"suggestion": result["suggestion"],
                         "steps": len(lrs), "diverged": diverged}}
        )
        return result

    # ------------------------------------------------------------------
    def fit(
        self,
        resume_from: Optional[str] = None,
        init_encoder_from: Optional[str] = None,
    ) -> TrainState:
        """Train; `resume_from` restores params from an orbax checkpoint dir
        (e.g. <out_dir>/ckpt_last) before the first epoch (SURVEY.md §5.4).
        `init_encoder_from` grafts a pretrained encoder subtree (the
        {"encoder": ...} checkpoint written by pretrain_cpc.py) into fresh
        VAP params — the in-framework equivalent of the reference loading
        the downloaded CPC weights (encoder_components.py:371-379)."""
        train_loader, val_loader = self.make_loaders()
        assert train_loader is not None, "data_conf.train_path is required"

        if self.mono:
            from voiceactivityprojection_tpu.models.vap import init_vap_mono

            params = init_vap_mono(jax.random.key(self.seed), self.model_conf)
        else:
            params = init_vap(jax.random.key(self.seed), self.model_conf)
        if init_encoder_from:
            if os.path.isfile(init_encoder_from):
                # libri-light-format CPC blob ({"config","weights"} .pt,
                # encoder_components.py:371-402): graft gEncoder+gAR, keep
                # the fresh learned downsample (vap/encoder.py:26-38)
                from voiceactivityprojection_tpu.models.checkpoint import (
                    load_cpc_blob,
                )

                cpc = load_cpc_blob(os.path.abspath(init_encoder_from))
                params["encoder"] = {**params["encoder"], **cpc}
            else:
                from voiceactivityprojection_tpu.models.checkpoint import (
                    restore_checkpoint,
                )

                params["encoder"] = restore_checkpoint(
                    os.path.abspath(init_encoder_from),
                    {"encoder": params["encoder"]},
                )["encoder"]
            print(f"Initialized encoder from {init_encoder_from}")
        state = init_train_state(params, self.tx)
        start_epoch = 0
        best_val = float("inf")
        resumed_full = False
        if resume_from:
            path = os.path.abspath(resume_from)
            meta = {}
            try:
                with open(path + ".json") as f:
                    meta = json.load(f)
            except (OSError, ValueError):
                pass  # no sidecar: legacy params-only checkpoint
            if meta.get("format") == "trainstate_v2":
                state, start_epoch, best_val = self._restore_full(
                    state, path, meta, train_loader
                )
                resumed_full = True
                print(
                    f"Resumed FULL training state from {resume_from} "
                    f"(epoch {start_epoch}, step {meta['step']})"
                )
            else:
                from voiceactivityprojection_tpu.models.checkpoint import (
                    restore_checkpoint,
                )

                params = restore_checkpoint(path, {"params": params})["params"]
                state = init_train_state(params, self.tx)
                print(
                    f"Resumed params from {resume_from} (legacy params-only "
                    "checkpoint: optimizer/schedule state starts fresh)"
                )
        with jax.set_mesh(self.mesh):
            # a full resume carries the plateau-adjusted LR in opt_state;
            # re-running the LR sweep would clobber it
            if self.opt_conf.find_learning_rate and not resumed_full:
                # reference train.py:222-223: run the LR-range test and
                # adopt the suggestion before training
                found = self.find_lr(train_loader, params)
                print(f"lr_find: adopting learning_rate={found['suggestion']:.3g} "
                      f"(swept {len(found['lrs'])} steps)")
                state = set_learning_rate(
                    replicate_tree(state, self.mesh), found["suggestion"]
                )
            else:
                state = replicate_tree(state, self.mesh)
            key = jax.random.key(self.seed + 1)

            base_key = jax.device_put(key)

            def prepare(batch):
                """Host side of a step: draw the augmentation plan, apply
                the host pitch branch (numpy), ONE sharded host->device
                put. Called one step AHEAD of consumption so the upload
                overlaps the previous step's compute — measured on the
                v5e tunnel this pipelining is the difference between ~900
                and ~160 ms/step at B=16 f32 (fresh uploads consumed
                immediately serialize with the device queue)."""
                semis, choice = self.augment.plan()
                if semis is not None:
                    batch = dict(batch)
                    batch["waveform"] = self.augment.apply_pitch_host(
                        np.asarray(batch["waveform"]), semis
                    )
                return (
                    shard_batch(
                        {k: np.asarray(v) for k, v in batch.items()}, self.mesh
                    ),
                    choice,
                )

            for epoch in range(start_epoch, self.max_epochs):
                # ---- train
                t0 = time.time()
                losses = []
                data_wait = 0.0  # time blocked on the loader (prefetch miss)
                prep_s = 0.0     # host pitch + host->device put
                dispatch_s = 0.0  # time blocked dispatching the fused step
                n_steps = 0
                it = enumerate(train_loader)
                pending = None
                while True:
                    tw = time.time()
                    try:
                        i, batch = next(it)
                    except StopIteration:
                        break
                    data_wait += time.time() - tw
                    if self.limit_batches and i >= self.limit_batches:
                        break
                    n_steps += 1
                    tw = time.time()
                    prep = prepare(batch)
                    prep_s += time.time() - tw
                    if pending is not None:
                        tw = time.time()
                        state, metrics = self.train_step(
                            state, pending[0], base_key, pending[1]
                        )
                        dispatch_s += time.time() - tw
                        # keep the DEVICE scalar: float() here would block
                        # on a host fetch every step (~28 ms tunnel RTT)
                        # and stop step n+1 dispatching behind step n
                        losses.append(metrics["loss"])
                    pending = prep
                if pending is not None:  # drain the pipeline
                    state, metrics = self.train_step(
                        state, pending[0], base_key, pending[1]
                    )
                    losses.append(metrics["loss"])
                train_loss = (
                    float(np.mean(jax.device_get(losses)))
                    if losses else float("nan")
                )

                train_s = time.time() - t0
                record = {
                    "epoch": epoch,
                    "loss": train_loss,
                    "lr": get_learning_rate(state),
                    "train_s": round(train_s, 1),
                    # host-overhead observability: how long the step loop
                    # sat waiting for data (loader not hidden by prefetch),
                    # preparing batches (pitch + put), and blocked on step
                    # dispatch (device backpressure)
                    "data_wait_s": round(data_wait, 2),
                    "prep_s": round(prep_s, 2),
                    "dispatch_s": round(dispatch_s, 2),
                    "steps": n_steps,
                }
                if not self.mono and n_steps and train_s > 0:
                    # wall-clock train MFU: analytic fwd+bwd(+flash
                    # recompute) FLOPs over the WHOLE epoch wall time —
                    # includes data wait and host overhead, so it is the
                    # honest end-to-end figure (the step-only roofline is
                    # bench.py --train)
                    from voiceactivityprojection_tpu.utils.flops import (
                        device_peak_tflops,
                        stereo_train_flops,
                    )

                    peak = device_peak_tflops()
                    if peak:
                        per_chunk = stereo_train_flops(
                            int(self.data_conf.audio_duration
                                * self.data_conf.sample_rate),
                            self.model_conf.dim,
                            self.model_conf.channel_layers,
                            self.model_conf.cross_layers,
                            frozen_encoder=self.model_conf.freeze_encoder,
                        )["total"]
                        achieved = (
                            per_chunk * self.data_conf.batch_size * n_steps
                            / train_s / 1e12
                        )
                        record["train_tflops"] = round(achieved, 2)
                        record["train_mfu"] = round(achieved / peak, 4)

                # ---- validate
                stop = False
                if val_loader is not None:
                    val = self.validate(state.params, val_loader)
                    record.update(val)
                    val_loss = val["val_loss"]
                    state = self.plateau.update(state, val_loss)
                    stop = self.early_stop.update(val_loss)
                    if val_loss < best_val:
                        best_val = val_loss
                        self.save(state, "best", epoch=epoch,
                                  best_val=best_val, train_loader=train_loader)
                # per-epoch resume anchor: ckpt_last always carries the
                # full state as of the END of this epoch
                self.save(state, "last", epoch=epoch, best_val=best_val,
                          train_loader=train_loader)
                if stop:
                    record["early_stop"] = True
                self.logger.log(record)
                if stop:
                    break
            if not os.path.isdir(os.path.join(self.out_dir, "ckpt_last")):
                # zero-epoch fit (max_epochs already reached, or 0): still
                # leave a resume anchor in this out_dir
                self.save(state, "last", epoch=start_epoch - 1,
                          best_val=best_val, train_loader=train_loader)
        return state

    # ------------------------------------------------------------------
    def validate(self, params, val_loader, split: str = "val") -> Dict[str, float]:
        vap_losses, vad_losses = [], []
        em = EventMetrics()
        for i, batch in enumerate(val_loader):
            if self.limit_batches and i >= self.limit_batches:
                break
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            out = self.eval_step(params, jbatch)
            vap_losses.append(float(out["vap_loss"]))
            vad_losses.append(float(out["vad_loss"]))

            events = self.event_extractor(np.asarray(batch["vad"]))
            probs = get_probs(out["logits"])
            preds, targets = extract_prediction_and_targets(
                np.asarray(probs["p_now"]), np.asarray(probs["p_future"]), events
            )
            em.update(preds, targets)

        rec = {
            f"{split}_loss": float(np.mean(vap_losses)) if vap_losses else float("nan"),
            f"{split}_loss_va": float(np.mean(vad_losses)) if vad_losses else float("nan"),
        }
        rec.update({f"{split}_{k}": v for k, v in em.compute().items()})

        probe = self.phrase_probe()
        if probe is not None:
            from voiceactivityprojection_tpu.models.vap import (
                VapModel,
                VapMonoModel,
            )

            mdl = (
                VapMonoModel(self.model_conf, params)
                if self.mono
                else VapModel(self.model_conf, params)
            )
            means, _ = probe.extract_stats(mdl)
            if split == "val":
                # the scalar subset the reference logs at val epochs
                # (vap/phrases/dataset.py:252-266)
                rec.update(probe.val_log_stats(means))
            else:
                # test logs everything (dataset.py:268-273)
                rec.update(
                    {f"{split}_{k}": float(v) for k, v in means.items()}
                )
        return rec

    # ------------------------------------------------------------------
    def save(
        self,
        state: TrainState,
        tag: str,
        epoch: Optional[int] = None,
        best_val: float = float("inf"),
        train_loader=None,
    ) -> None:
        """Write the FULL training state (VERDICT r3 item 2; the reference's
        Lightning .ckpt restores optimizer state, epoch and callback state,
        vap/train.py:187-192): params + opt_state (AdamW moments + the
        plateau-adjusted LR living in inject_hyperparams) + step go to
        orbax; the host-side schedule state (epoch, best-val, plateau and
        early-stop counters) and every host PRNG (augment plan, data order,
        event negative-sampling) go to the JSON sidecar — so a resumed run
        replays the straight run exactly (tests/test_train_loop.py
        resume-equivalence)."""
        path = os.path.abspath(os.path.join(self.out_dir, f"ckpt_{tag}"))
        ev = self.event_extractor.rng.getstate()
        meta = {
            "model_conf": asdict(self.model_conf),
            "opt_conf": asdict(self.opt_conf),
            "step": int(jax.device_get(state.step)),
            "format": "trainstate_v2",
            "trainer": {
                "next_epoch": (epoch + 1) if epoch is not None else 0,
                # None for "no val yet": bare Infinity is not standard
                # JSON and breaks strict consumers (jq etc.)
                "best_val": best_val if np.isfinite(best_val) else None,
                "plateau": {
                    "best": self.plateau.best,
                    "bad_epochs": self.plateau.bad_epochs,
                },
                "early_stop": {
                    "best": self.early_stop.best,
                    "bad_epochs": self.early_stop.bad_epochs,
                },
                "augment_rng": self.augment.np_rng.bit_generator.state,
                "loader_rng": (
                    train_loader.rng.bit_generator.state
                    if train_loader is not None
                    else None
                ),
                "events_rng": [ev[0], list(ev[1]), ev[2]],
            },
        }
        # Tensors FIRST, sidecar LAST (atomically): a crash mid-save must
        # never leave an epoch-N sidecar next to epoch-N-1 (or deleted)
        # tensors — the sidecar is the commit record of the whole ckpt.
        save_checkpoint(
            path,
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step},
        )
        sidecar = os.path.join(self.out_dir, f"ckpt_{tag}.json")
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, sidecar)

    def _restore_full(self, state: TrainState, path: str, meta: Dict,
                      train_loader) -> Tuple[TrainState, int, float]:
        """Inverse of `save` for format=trainstate_v2 checkpoints."""
        from voiceactivityprojection_tpu.models.checkpoint import (
            restore_checkpoint,
        )

        restored = restore_checkpoint(
            path,
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step},
        )
        state = TrainState(
            restored["params"], restored["opt_state"], restored["step"]
        )
        # Torn-save detection: tensors are written before the sidecar, so a
        # crash between the two leaves a step mismatch — refuse to resume
        # from a checkpoint whose halves disagree rather than silently
        # replaying with mismatched weights/schedule.
        ckpt_step = int(jax.device_get(state.step))
        if int(meta.get("step", ckpt_step)) != ckpt_step:
            raise RuntimeError(
                f"Checkpoint {path} is torn: sidecar step "
                f"{meta.get('step')} != tensor step {ckpt_step} "
                "(crash mid-save?). Resume from the previous ckpt tag."
            )
        tr = meta["trainer"]
        self.plateau.best = tr["plateau"]["best"]
        self.plateau.bad_epochs = tr["plateau"]["bad_epochs"]
        self.early_stop.best = tr["early_stop"]["best"]
        self.early_stop.bad_epochs = tr["early_stop"]["bad_epochs"]
        if tr.get("augment_rng"):
            self.augment.np_rng.bit_generator.state = tr["augment_rng"]
        if tr.get("loader_rng") and train_loader is not None:
            train_loader.rng.bit_generator.state = tr["loader_rng"]
        if tr.get("events_rng"):
            v, st, g = tr["events_rng"]
            self.event_extractor.rng.setstate((v, tuple(st), g))
        best_val = tr.get("best_val", float("inf"))
        if best_val is None:
            best_val = float("inf")
        return state, int(tr["next_epoch"]), float(best_val)
