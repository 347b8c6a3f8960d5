"""Phrases corpus tests against the real reference data mount."""

import os

import numpy as np
import pytest
import jax

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.data.phrases import (
    DEFAULT_PHRASES_ROOT,
    PHRASE_CSV,
    PhraseDataset,
    PhraseProbe,
    get_region_shift_probs,
    load_phrase_dataframe,
)
from voiceactivityprojection_tpu.models.vap import VapModel

pytestmark = pytest.mark.data

CSV = os.path.join(DEFAULT_PHRASES_ROOT, PHRASE_CSV)
needs_corpus = pytest.mark.skipif(not os.path.exists(CSV), reason="no phrases corpus")


@needs_corpus
def test_load_dataframe():
    df = load_phrase_dataframe(CSV)
    assert len(df) == 180  # 9 phrases x 2 lengths x 2 genders x 5 idx
    row = df.iloc[0]
    assert isinstance(row["words"], list)
    assert isinstance(row["vad_list"], list)
    assert row["ends"][-1] > 0


@needs_corpus
def test_phrase_dataset_fixed_shape():
    ds = PhraseDataset()
    a = ds[0]
    b = ds[100]
    # TPU-first: every sample padded to one corpus-wide shape
    assert a["waveform"].shape == b["waveform"].shape == (2, ds.n_samples)
    assert a["vad"].shape == b["vad"].shape == (ds.n_frames, 2)
    assert a["waveform"][1].sum() == 0  # silent channel B
    assert a["end"] < ds.n_frames


@needs_corpus
def test_limit_keeps_both_lengths():
    """Any limit (even 1) must keep >=1 short AND >=1 long row — the
    val_ps_*/val_pl_* probe scalar families index both buckets."""
    for limit in (1, 2, 3):
        ds = PhraseDataset(limit=limit)
        kinds = set(ds.df["long_short"])
        assert kinds == {"short", "long"}, (limit, kinds)


@needs_corpus
def test_get_sample_lookup():
    ds = PhraseDataset()
    s = ds.get_sample("student", "short", "female", 0)
    assert s["phrase"] == "student"
    assert s["long_short"] == "short"


def test_region_shift_probs():
    p = np.tile(np.arange(100, dtype=np.float32)[:, None], (1, 2))
    h, pr, r = get_region_shift_probs(p, end=50, region_frames=10)
    assert h.shape == (40,) and pr.shape == (10,) and r.shape == (10,)
    assert pr[0] == 40 and r[0] == 50


@needs_corpus
@pytest.mark.slow
def test_phrase_probe_subset():
    """Probe a few batches with a tiny model end-to-end."""
    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    model = VapModel.init(jax.random.key(0), conf)
    probe = PhraseProbe(batch_size=4)
    # limit corpus: monkeypatch df to 8 rows (2 long, keep both lengths)
    df = probe.dset.df
    sub = df[df["phrase"] == "student"]
    import pandas as pd

    probe.dset.df = pd.concat(
        [sub[sub["long_short"] == "short"].iloc[:4],
         sub[sub["long_short"] == "long"].iloc[:4]]
    ).reset_index(drop=True)
    means, stds = probe.extract_stats(model)
    for k in ("short_now_hold", "short_future_pred"):
        assert k in means and 0 <= means[k] <= 1
    assert "long_scp_future_pred" in means
    log = probe.val_log_stats(means)
    assert set(log) == {
        "val_ps_hold", "val_ps_pred", "val_ps_react",
        "val_pl_hold", "val_pl_pred", "val_pl_react",
        "val_pls_hold", "val_pls_pred", "val_pls_react",
    }


def test_directionality_paired_stats(tmp_path):
    """analyzes/phrases_directionality.py: paired diffs pair each permuted
    sample with ITS OWN regular version; the sign test and bootstrap CI
    detect a planted effect and ignore an absent one."""
    import csv as _csv
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "pdir",
        pathlib.Path(__file__).resolve().parents[1]
        / "analyzes" / "phrases_directionality.py",
    )
    pdir = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pdir)

    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        key = dict(phrase="p", long_short="short", gender="f",
                   phrase_idx=str(i))
        base = float(rng.uniform(0.4, 0.6))
        rows.append({**key, "permutation": "regular",
                     "now_pred": f"{base:.6f}"})
        rows.append({**key, "permutation": "flat_f0",
                     "now_pred": f"{base - 0.1 + rng.normal(0, 0.005):.6f}"})
        # null effect with sign-balanced noise by construction
        null_noise = 0.005 * (1 + 0.1 * rng.random()) * (1 if i % 2 else -1)
        rows.append({**key, "permutation": "shift_f0_up",
                     "now_pred": f"{base + null_noise:.6f}"})
    path = tmp_path / "scores.csv"
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=sorted({k for r in rows for k in r}))
        w.writeheader()
        w.writerows(rows)

    loaded = pdir.load_rows(str(path))
    d_flat = pdir.paired_diffs(loaded, "flat_f0", "now_pred")
    d_null = pdir.paired_diffs(loaded, "shift_f0_up", "now_pred")
    assert len(d_flat) == len(d_null) == 40
    assert d_flat.mean() == pytest.approx(-0.1, abs=0.01)
    lo, hi = pdir.bootstrap_ci(d_flat)
    assert hi < 0 < -lo  # planted drop: CI strictly below zero
    assert pdir.sign_test_p(d_flat) < 1e-6
    # absent effect: mean at the noise scale, sign test not significant
    assert abs(d_null.mean()) < 0.005
    assert pdir.sign_test_p(d_null) > 0.05


def test_make_phrase_probe_gating(tmp_path):
    """phrases_probe: 0 off, -1 auto (None when corpus missing), 1 required
    (raises when missing); auto+corpus returns a limited probe."""
    from dataclasses import replace

    from voiceactivityprojection_tpu.config import DataConfig
    from voiceactivityprojection_tpu.data.phrases import make_phrase_probe

    off = DataConfig(phrases_probe=0)
    assert make_phrase_probe(off) is None

    missing = DataConfig(phrases_probe=-1, phrases_root=str(tmp_path))
    assert make_phrase_probe(missing) is None

    required = DataConfig(phrases_probe=1, phrases_root=str(tmp_path))
    with pytest.raises(FileNotFoundError):
        make_phrase_probe(required)

    if os.path.exists(CSV):
        auto = DataConfig(phrases_probe=-1, phrases_probe_limit=4)
        probe = make_phrase_probe(auto)
        assert probe is not None and len(probe.dset) == 4
        lengths = set(probe.dset.df["long_short"])
        assert lengths == {"short", "long"}


@needs_corpus
def test_evaluate_merges_phrase_probe(tmp_path):
    """evaluate(phrase_probe=...) merges test_-prefixed region means into
    the metrics CSV (reference vap/evaluation.py:298 +
    vap/phrases/dataset.py:268-273)."""
    import csv as _csv

    import numpy as np

    from voiceactivityprojection_tpu.config import DataConfig, EventConfig
    from voiceactivityprojection_tpu.data.phrases import make_phrase_probe
    from voiceactivityprojection_tpu.train.evaluation import evaluate

    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    model = VapModel.init(jax.random.key(0), conf)
    probe = make_phrase_probe(DataConfig(phrases_probe=1, phrases_probe_limit=4))
    result = evaluate(
        model, [], EventConfig(), out_dir=str(tmp_path),
        threshold_search=False, phrase_probe=probe,
    )
    assert "test_short_future_pred" in result
    assert "test_long_scp_now_react" in result
    with open(os.path.join(str(tmp_path), "metrics.csv")) as f:
        rows = list(_csv.reader(f))
    assert "test_short_future_pred" in rows[0]
    vals = dict(zip(rows[0], rows[1]))
    assert 0.0 <= float(vals["test_short_future_pred"]) <= 1.0


@needs_corpus
def test_phrase_probe_mono_va_history():
    """A va_history mono model is probed WITH the history feature (the
    reference passes vad_history during phrase evaluation,
    evaluation_phrases.py:339-349): removing the history head changes the
    probe stats, proving vah reaches the forward."""
    import jax as _jax

    from voiceactivityprojection_tpu.config import VapMonoConfig
    from voiceactivityprojection_tpu.models.vap import VapMonoModel

    conf = VapMonoConfig(
        dim=16, encoder_dim=16, channel_layers=1, cross_layers=1,
        va_history=True,
    )
    model = VapMonoModel.init(_jax.random.key(0), conf)
    probe = PhraseProbe(batch_size=4, mono=True, limit=4,
                        va_history_times=(2.0, 1.0, 0.5, 0.25))
    m1, _ = probe.extract_stats(model)

    params2 = dict(model.params)
    params2.pop("va_cond_history")  # forward silently skips the branch
    m2, _ = probe.extract_stats(VapMonoModel(conf, params2))
    assert any(abs(m1[k] - m2[k]) > 1e-9 for k in m1)
