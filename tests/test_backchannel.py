"""SWB reader tests against the real transcription mount."""

import os

import numpy as np
import pytest

from voiceactivityprojection_tpu.data.backchannel import (
    DEFAULT_SWB_ROOT,
    SWBReader,
)

pytestmark = pytest.mark.data

needs_swb = pytest.mark.skipif(
    not os.path.isdir(os.path.join(DEFAULT_SWB_ROOT, "swb_ms98_transcriptions")),
    reason="no SWB transcriptions",
)


@needs_swb
def test_reader_finds_sessions():
    r = SWBReader()
    assert len(r.sessions) > 0
    s = r.sessions[0]
    p = r.session_to_path[s]
    assert os.path.exists(p["A"]["trans"])
    assert os.path.exists(p["B"]["words"])


@needs_swb
def test_splits_exist():
    r = SWBReader()
    for split in ("train", "val", "test"):
        sessions = r.split_sessions(split)
        assert len(sessions) > 0


@needs_swb
def test_get_session_structure():
    r = SWBReader()
    session = r.sessions[0]
    info = r.get_session(session)
    for ch in ("A", "B"):
        df = info[ch]
        assert len(df) > 0
        row = df.iloc[0]
        assert row["speaker"] == ch
        assert isinstance(row["words"], list) and len(row["words"]) > 0
        assert row["start"] <= row["end"]
        # word-aligned boundaries: start equals first word start
        assert row["start"] == row["starts"][0]
        assert row["end"] == row["ends"][-1]
    dialog = info["dialog"]
    starts = dialog["start"].to_numpy()
    assert (np.diff(starts) >= 0).all()  # sorted by start


@needs_swb
def test_da_words_joined():
    r = SWBReader()
    # find a session with dialog-act files
    for session in r.sessions[:20]:
        if os.path.exists(r.session_to_path[session]["A"]["da_words"]):
            info = r.get_session(session)
            if "da" in info["A"].columns:
                row = info["A"].iloc[0]
                assert isinstance(row["da"], list)
                return
    pytest.skip("no sessions with DA annotations in mount")


@needs_swb
def test_audio_path_mapping():
    r = SWBReader()
    if not r.audio_rel_paths:
        pytest.skip("no relative_audio_path.json")
    session = next(iter(r.audio_rel_paths))
    p = r.session_to_audio_path(session, "/audio")
    assert p.startswith("/audio/") and p.endswith(".wav")
