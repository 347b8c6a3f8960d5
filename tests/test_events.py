"""Turn-taking event extraction tests: hand-constructed VAD scenarios with
known event locations, template/condition semantics, and balancing."""

import numpy as np
import pytest

from voiceactivityprojection_tpu.config import EventConfig
from voiceactivityprojection_tpu.events.events import (
    Backchannel,
    HoldShift,
    TurnTakingEvents,
    backchannel_regions,
    fill_pauses,
    get_negative_sample_regions,
    hold_shift_regions,
)
from voiceactivityprojection_tpu.ops.vad import get_dialog_states_np

pytestmark = pytest.mark.events

HZ = 50


def seg_vad(n_frames, segments):
    """segments: list of (start, end, channel)."""
    vad = np.zeros((n_frames, 2), dtype=np.float32)
    for s, e, c in segments:
        vad[s:e, c] = 1.0
    return vad


def test_fill_pauses():
    # A speaks 0-100, pause 100-120, A speaks 120-200 -> pause filled
    vad = seg_vad(250, [(0, 100, 0), (120, 200, 0), (220, 250, 1)])
    ds = get_dialog_states_np(vad)
    filled = fill_pauses(vad, ds)
    assert filled[100:120, 0].all()
    # the silence between A (ends 200) and B (starts 220) must NOT be filled
    assert filled[200:220].sum() == 0


def hs_kwargs(**over):
    kw = dict(
        pre_cond_frames=50,
        post_cond_frames=50,
        prediction_region_frames=25,
        prediction_region_on_active=True,
        long_onset_condition_frames=50,
        long_onset_region_frames=10,
        min_silence_frames=12,
        min_context_frames=150,
        max_frame=1000,
    )
    kw.update(over)
    return kw


def test_shift_detected():
    # A: 0-200, silence 200-220, B: 220-400  -> shift to B at silence start
    vad = seg_vad(500, [(0, 200, 0), (220, 400, 1)])
    ds = get_dialog_states_np(vad)
    r = hold_shift_regions(vad, ds, **hs_kwargs())
    assert r["shift"] == [(200, 220, 1)]
    assert r["hold"] == []
    # prediction region precedes the silence
    assert r["pred_shift"] == [(175, 200, 1)]
    # onset 220-400 = 180 frames >= 50 -> long-onset region
    assert r["long"] == [(220, 230, 1)]


def test_hold_detected():
    # A: 0-200, pause 200-220, A: 220-400 -> hold
    vad = seg_vad(500, [(0, 200, 0), (220, 400, 0)])
    ds = get_dialog_states_np(vad)
    r = hold_shift_regions(vad, ds, **hs_kwargs())
    assert r["hold"] == [(200, 220, 0)]
    assert r["shift"] == []


def test_min_context_gates_event():
    vad = seg_vad(500, [(0, 200, 0), (220, 400, 1)])
    ds = get_dialog_states_np(vad)
    r = hold_shift_regions(vad, ds, **hs_kwargs(min_context_frames=300))
    assert r["shift"] == []


def test_min_silence_gates_event():
    # 20-frame silence < 30 required
    vad = seg_vad(500, [(0, 200, 0), (220, 400, 1)])
    ds = get_dialog_states_np(vad)
    r = hold_shift_regions(vad, ds, **hs_kwargs(min_silence_frames=30))
    assert r["shift"] == []


def test_pre_cond_other_speaker_blocks():
    # B makes a blip inside A's pre-window -> no clean shift
    vad = seg_vad(500, [(0, 200, 0), (180, 190, 1), (220, 400, 1)])
    ds = get_dialog_states_np(vad)
    r = hold_shift_regions(vad, ds, **hs_kwargs())
    assert r["shift"] == []


def test_max_frame_gates_event():
    vad = seg_vad(500, [(0, 200, 0), (220, 400, 1)])
    ds = get_dialog_states_np(vad)
    r = hold_shift_regions(vad, ds, **hs_kwargs(max_frame=150))
    assert r["shift"] == []


def test_backchannel_detected():
    # A speaks throughout; B gives a short 'mm' at 200-230 (0.6 s < 1 s max)
    vad = seg_vad(600, [(0, 600, 0), (200, 230, 1)])
    ds = get_dialog_states_np(vad)
    r = backchannel_regions(
        vad, ds,
        pre_cond_frames=50, post_cond_frames=50, prediction_region_frames=25,
        min_context_frames=150, max_bc_frames=50, max_frame=1000,
    )
    assert r["backchannel"] == [(200, 230, 1)]
    assert r["pred_backchannel"] == [(175, 200, 1)]


def test_backchannel_too_long_rejected():
    vad = seg_vad(600, [(0, 600, 0), (200, 300, 1)])  # 2 s utterance
    ds = get_dialog_states_np(vad)
    r = backchannel_regions(
        vad, ds,
        pre_cond_frames=50, post_cond_frames=50, prediction_region_frames=25,
        min_context_frames=150, max_bc_frames=50, max_frame=1000,
    )
    assert r["backchannel"] == []


def test_negative_sample_regions():
    # long A activity 0-500 (with a filled pause) -> negatives for B
    vad = seg_vad(600, [(0, 240, 0), (260, 500, 0)])
    ds = get_dialog_states_np(vad)
    regions = get_negative_sample_regions(
        vad, ds,
        min_pad_left_frames=50, min_pad_right_frames=100,
        min_region_frames=25, min_context_frames=150, max_frame=550,
    )
    assert regions == [(150, 400, 1)]


def test_turn_taking_events_end_to_end():
    conf = EventConfig(frame_hz=HZ, min_context_time=3.0, max_time=20.0)
    extractor = TurnTakingEvents(conf, seed=0)
    # batch of 2: one with a shift, one with hold + backchannel
    vad = np.stack(
        [
            seg_vad(1000, [(0, 400, 0), (430, 900, 1)]),
            seg_vad(1000, [(0, 400, 0), (430, 900, 0), (600, 630, 1)]),
        ]
    )
    events = extractor(vad)
    expected_keys = {
        "shift", "hold", "long", "pred_shift", "pred_shift_neg",
        "short", "pred_backchannel", "pred_backchannel_neg",
    }
    assert expected_keys == set(events)
    assert events["shift"][0] == [(400, 430, 1)]
    assert events["hold"][1] == [(400, 430, 0)]  # equal_hold_shift keeps 1
    assert events["short"][1] == [(600, 630, 1)]
    # balancing: #holds == #shifts overall
    n_shift = sum(len(e) for e in events["shift"])
    n_hold = sum(len(e) for e in events["hold"])
    assert n_hold == n_shift == 1
    # pred_shift_neg sampled from pred_holds, same count as pred_shift
    n_ps = sum(len(e) for e in events["pred_shift"])
    n_psn = sum(len(e) for e in events["pred_shift_neg"])
    assert n_psn == n_ps == 1


def test_debt_accounting_carries_across_batches():
    conf = EventConfig(frame_hz=HZ, equal_hold_shift=True)
    ex = TurnTakingEvents(conf, seed=1)
    # batch A: 2 shifts, 0 holds -> debt of 2 for "shift"
    vad_shift = np.stack(
        [seg_vad(1000, [(0, 400, 0), (430, 900, 1)])],
    )
    vad_two_holds = np.stack(
        [seg_vad(1000, [(0, 300, 0), (330, 600, 0), (630, 900, 0)])],
    )
    ev1 = ex(vad_shift)  # 1 shift, 0 holds -> hold debt 1
    assert sum(len(e) for e in ev1["shift"]) == 1
    assert sum(len(e) for e in ev1["hold"]) == 0
    assert ex.add_extra["shift"] == 1
    ev2 = ex(vad_two_holds)  # 0 shifts, 2 holds -> samples 0 + 1 debt
    assert sum(len(e) for e in ev2["hold"]) == 1
    assert ex.add_extra["shift"] == 0


def test_region_extraction_prediction_and_targets():
    """extract_prediction_and_targets semantics (vap/objective.py:283-382)."""
    from voiceactivityprojection_tpu.events.metrics import (
        extract_prediction_and_targets,
    )

    p_now = np.full((1, 1000, 2), 0.8, dtype=np.float32)
    p_fut = np.full((1, 1000, 2), 0.3, dtype=np.float32)
    events = {
        "shift": [[(100, 110, 1)]],
        "hold": [[(200, 210, 0)]],
        "pred_shift": [[(300, 310, 1)]],
        "pred_shift_neg": [[(400, 410, 0)]],
        "long": [[(500, 510, 1)]],
        "short": [[(600, 610, 0)]],
        "pred_backchannel": [[]],
        "pred_backchannel_neg": [[]],
    }
    preds, targets = extract_prediction_and_targets(p_now, p_fut, events)
    # hs: shift probs as-is (0.8 x10), hold probs 1-p (0.2 x10)
    np.testing.assert_allclose(preds["hs"][:10], 0.8)
    np.testing.assert_allclose(preds["hs"][10:], 0.2, atol=1e-6)
    np.testing.assert_array_equal(targets["hs"][:10], 1)
    np.testing.assert_array_equal(targets["hs"][10:], 0)
    # pred_shift: positive p_fut, negative 1-p_fut
    np.testing.assert_allclose(preds["pred_shift"][:10], 0.3)
    np.testing.assert_allclose(preds["pred_shift"][10:], 0.7, atol=1e-6)
    # ls: long p_fut, short p_fut (not flipped)
    np.testing.assert_allclose(preds["ls"], 0.3)
    np.testing.assert_array_equal(targets["ls"][:10], 1)
    np.testing.assert_array_equal(targets["ls"][10:], 0)
    assert preds["pred_backchannel"] is None
