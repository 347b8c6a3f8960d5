"""Evaluation harness: test-split metrics + decision-threshold search.

Mirrors reference vap/evaluation.py:
* `evaluate` (evaluation.py:245-322): run the test split, aggregate losses
  and event Accuracy/F1, flatten to a CSV row.
* `get_curves` / `find_threshold` (evaluation.py:71-232): sweep 101
  decision thresholds per event family over pooled region probabilities,
  compute weighted-F1 / balanced-accuracy curves, pick the best-F1
  threshold, save thresholds.json (+ curves .npz).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from voiceactivityprojection_tpu.events.events import TurnTakingEvents
from voiceactivityprojection_tpu.events.metrics import (
    EventMetrics,
    extract_prediction_and_targets,
)
from voiceactivityprojection_tpu.ops.codebook import get_probs
from voiceactivityprojection_tpu.utils.io import write_json


def _confusion(preds_bin: np.ndarray, targets: np.ndarray) -> Tuple[int, int, int, int]:
    tp = int(((preds_bin == 1) & (targets == 1)).sum())
    tn = int(((preds_bin == 0) & (targets == 0)).sum())
    fp = int(((preds_bin == 1) & (targets == 0)).sum())
    fn = int(((preds_bin == 0) & (targets == 1)).sum())
    return tp, tn, fp, fn


def get_curves(
    preds: np.ndarray, targets: np.ndarray, thresholds: Optional[np.ndarray] = None
) -> Dict[str, np.ndarray]:
    """Per-threshold weighted F1 + balanced accuracy (contract of
    evaluation.py:71-142)."""
    if thresholds is None:
        thresholds = np.linspace(0.0, 1.0, 101)
    f1w, bacc, prec, rec = [], [], [], []
    targets = np.asarray(targets).astype(np.int64)
    n0 = int((targets == 0).sum())
    n1 = int((targets == 1).sum())
    for t in thresholds:
        pb = (np.asarray(preds) >= t).astype(np.int64)
        tp, tn, fp, fn = _confusion(pb, targets)
        p1 = tp / (tp + fp) if tp + fp else 0.0
        r1 = tp / (tp + fn) if tp + fn else 0.0
        f1_1 = 2 * p1 * r1 / (p1 + r1) if p1 + r1 else 0.0
        p0 = tn / (tn + fn) if tn + fn else 0.0
        r0 = tn / (tn + fp) if tn + fp else 0.0
        f1_0 = 2 * p0 * r0 / (p0 + r0) if p0 + r0 else 0.0
        total = n0 + n1
        f1w.append((f1_0 * n0 + f1_1 * n1) / total if total else 0.0)
        bacc.append((r0 + r1) / 2)
        prec.append(p1)
        rec.append(r1)
    return {
        "thresholds": thresholds,
        "f1_weighted": np.asarray(f1w),
        "balanced_accuracy": np.asarray(bacc),
        "precision": np.asarray(prec),
        "recall": np.asarray(rec),
    }


def find_threshold(
    preds: np.ndarray, targets: np.ndarray, metric: str = "f1_weighted"
) -> Tuple[float, Dict[str, np.ndarray]]:
    """Best threshold by `metric` (contract of evaluation.py:144-232)."""
    curves = get_curves(preds, targets)
    best = int(np.argmax(curves[metric]))
    return float(curves["thresholds"][best]), curves


class EvaluationCollector:
    """Accumulates pooled region probabilities per event family across the
    test split, for both fixed-threshold metrics and threshold search."""

    FAMILIES = ("hs", "pred_shift", "ls", "pred_backchannel")

    def __init__(self, event_conf=None, seed: int = 0,
                 thresholds: Optional[Dict[str, float]] = None):
        """`thresholds` (family -> decision threshold, the thresholds.json
        layout) switches the metrics from 0.5 rounding to the transferred
        thresholds — the reference's find-on-one-split / apply-at-test
        flow (evaluation.py:245-322)."""
        self.event_extractor = TurnTakingEvents(event_conf, seed=seed)
        self.metrics = EventMetrics(thresholds)
        self.pooled: Dict[str, List[np.ndarray]] = {f: [] for f in self.FAMILIES}
        self.pooled_t: Dict[str, List[np.ndarray]] = {f: [] for f in self.FAMILIES}
        self.vap_losses: List[float] = []
        self.vad_losses: List[float] = []

    def update(self, logits: np.ndarray, vad: np.ndarray,
               vap_loss: float = float("nan"), vad_loss: float = float("nan")):
        events = self.event_extractor(vad)
        probs = get_probs(jnp.asarray(logits))
        preds, targets = extract_prediction_and_targets(
            np.asarray(probs["p_now"]), np.asarray(probs["p_future"]), events
        )
        self.metrics.update(preds, targets)
        for fam in self.FAMILIES:
            if preds.get(fam) is not None:
                self.pooled[fam].append(preds[fam])
                self.pooled_t[fam].append(targets[fam])
        self.vap_losses.append(vap_loss)
        self.vad_losses.append(vad_loss)

    def compute(self, threshold_search: bool = True) -> Dict[str, float]:
        def _mean_known(xs: List[float]) -> float:
            # callers that don't track losses push NaN placeholders; an
            # all-NaN list is "no losses recorded", not a warning
            known = [x for x in xs if not np.isnan(x)]
            return float(np.mean(known)) if known else float("nan")

        out: Dict[str, float] = {
            "test_loss": _mean_known(self.vap_losses),
            "test_loss_va": _mean_known(self.vad_losses),
        }
        out.update({f"test_{k}": v for k, v in self.metrics.compute().items()})
        self.curves: Dict[str, Dict[str, np.ndarray]] = {}
        if threshold_search:
            for fam in self.FAMILIES:
                if self.pooled[fam]:
                    p = np.concatenate(self.pooled[fam])
                    t = np.concatenate(self.pooled_t[fam])
                    thr, curves = find_threshold(p, t)
                    out[f"threshold_{fam}"] = thr
                    out[f"best_f1w_{fam}"] = float(curves["f1_weighted"].max())
                    self.curves[fam] = curves
        return out

    def save(self, out_dir: str, result: Dict[str, float]) -> None:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "metrics.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(list(result))
            w.writerow([result[k] for k in result])
        thresholds = {
            k.replace("threshold_", ""): v
            for k, v in result.items()
            if k.startswith("threshold_")
        }
        if thresholds:
            write_json(thresholds, os.path.join(out_dir, "thresholds.json"))
        # full curves (reference saved curves.pt, evaluation.py:144-232)
        if getattr(self, "curves", None):
            np.savez(
                os.path.join(out_dir, "curves.npz"),
                **{
                    f"{fam}_{key}": arr
                    for fam, cur in self.curves.items()
                    for key, arr in cur.items()
                },
            )
            try:
                from voiceactivityprojection_tpu.utils.plot import (
                    plot_threshold_curves,
                )

                for fam, cur in self.curves.items():
                    plot_threshold_curves(
                        cur,
                        savepath=os.path.join(out_dir, f"curves_{fam}.png"),
                        title=fam,
                    )
            except Exception:
                pass  # plotting is best-effort (headless minimal installs)


def evaluate(
    model,
    test_loader,
    event_conf=None,
    out_dir: str = "eval",
    limit_batches: Optional[int] = None,
    threshold_search: bool = True,
    thresholds: Optional[Dict[str, float]] = None,
    phrase_probe=None,
) -> Dict[str, float]:
    """Full test-split evaluation (contract of evaluation.py:245-322).
    Pass `thresholds` (e.g. json-loaded thresholds.json from a previous
    threshold-search run on the val split) to APPLY them at test time.
    `phrase_probe` (a data.phrases.PhraseProbe) additionally runs the
    phrase corpus through the model and merges every region-mean scalar
    into the metrics CSV with a test_ prefix — the reference registers
    PhrasesCallback in its evaluation Trainer (vap/evaluation.py:298,
    test logging at vap/phrases/dataset.py:268-273)."""
    from voiceactivityprojection_tpu.train.step import make_eval_step

    eval_step = make_eval_step(model.conf)
    collector = EvaluationCollector(event_conf, thresholds=thresholds)
    for i, batch in enumerate(test_loader):
        if limit_batches and i >= limit_batches:
            break
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        out = eval_step(model.params, jbatch)
        collector.update(
            np.asarray(out["logits"]),
            np.asarray(batch["vad"]),
            float(out["vap_loss"]),
            float(out["vad_loss"]),
        )
    result = collector.compute(threshold_search)
    if phrase_probe is not None:
        means, _ = phrase_probe.extract_stats(model)
        result.update({f"test_{k}": float(v) for k, v in means.items()})
    collector.save(out_dir, result)
    return result
