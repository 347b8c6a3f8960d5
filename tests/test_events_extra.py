"""Event-extraction edge cases: max_time override, get_da_labels,
all-silent and all-overlap inputs."""

import numpy as np
import pytest
import jax.numpy as jnp

from voiceactivityprojection_tpu.config import EventConfig
from voiceactivityprojection_tpu.events.events import TurnTakingEvents
from voiceactivityprojection_tpu.ops.codebook import get_da_labels

pytestmark = pytest.mark.events


def seg_vad(n_frames, segments):
    vad = np.zeros((n_frames, 2), dtype=np.float32)
    for s, e, c in segments:
        vad[s:e, c] = 1.0
    return vad


def test_max_time_override_restricts_events():
    conf = EventConfig(min_context_time=3.0, max_time=20.0)
    ex = TurnTakingEvents(conf, seed=0)
    vad = np.stack([seg_vad(1000, [(0, 400, 0), (430, 900, 1)])])
    full = ex(vad)
    assert full["shift"][0] == [(400, 430, 1)]
    # shift at frame 400 = 8 s; cap max_time below it -> no events
    ex2 = TurnTakingEvents(conf, seed=0)
    limited = ex2(vad, max_time=7.0)
    assert limited["shift"][0] == []


def test_get_da_labels():
    vad = jnp.asarray(
        np.stack([seg_vad(300, [(0, 300, 0)])]), dtype=jnp.float32
    )
    idx, ds = get_da_labels(vad, [10, 20, 30, 40])
    assert idx.shape == (1, 200)
    assert ds.shape == (1, 200)
    # only speaker A active across every window -> one active speaker
    np.testing.assert_array_equal(np.asarray(ds)[0], 1)


def test_all_silent_vad_yields_nothing():
    ex = TurnTakingEvents(EventConfig(), seed=0)
    out = ex(np.zeros((2, 1000, 2), dtype=np.float32))
    for key, batched in out.items():
        assert sum(len(b) for b in batched) == 0, key


def test_full_overlap_yields_nothing():
    ex = TurnTakingEvents(EventConfig(), seed=0)
    out = ex(np.ones((1, 1000, 2), dtype=np.float32))
    for key, batched in out.items():
        assert sum(len(b) for b in batched) == 0, key
