"""Streaming session server: concurrent live dialogs over ZMQ match the
single-stream KV streamer frame for frame."""

import threading

import numpy as np
import pytest
import jax

zmq = pytest.importorskip("zmq")

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.inference.server import (
    VapStreamClient,
    VapStreamServer,
)
from voiceactivityprojection_tpu.inference.streaming_kv import KVStreamingVap
from voiceactivityprojection_tpu.models.vap import VapModel

pytestmark = [pytest.mark.inference, pytest.mark.slow]

PORT = 5596
CONF = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)


def test_stream_sessions_match_single_streamer():
    model = VapModel.init(jax.random.key(0), CONF)
    server = VapStreamServer(
        model, streams=4, context_time=2.0, hop_frames=5, max_wait_ms=400
    )
    server.start(port=PORT)
    c1 = VapStreamClient(port=PORT, timeout_s=180)
    c2 = VapStreamClient(port=PORT, timeout_s=180)
    try:
        assert c1.open() != c2.open()
        rng = np.random.default_rng(0)
        hops = 4
        w1 = rng.normal(size=(2, hops * 5 * 320)).astype(np.float32) * 0.1
        w2 = rng.normal(size=(2, hops * 5 * 320)).astype(np.float32) * 0.1

        got1, got2 = [], []
        for i in range(hops):
            sl = slice(i * 5 * 320, (i + 1) * 5 * 320)
            res = [None, None]
            # both pushes must be in flight before the tick deadline
            t1 = threading.Thread(
                target=lambda: res.__setitem__(0, c1.push(w1[:, sl]))
            )
            t2 = threading.Thread(
                target=lambda: res.__setitem__(1, c2.push(w2[:, sl]))
            )
            t1.start(); t2.start(); t1.join(120); t2.join(120)
            assert res[0] is not None and res[1] is not None
            got1.append(res[0]); got2.append(res[1])

        p1 = np.concatenate([r["p_now"] for r in got1], axis=0)
        p2 = np.concatenate([r["p_now"] for r in got2], axis=0)

        for w, p in ((w1, p1), (w2, p2)):
            s = KVStreamingVap(model, context_time=2.0, hop_frames=5)
            s.reset()
            want = []
            for i in range(hops):
                sl = slice(i * 5 * 320, (i + 1) * 5 * 320)
                want.append(np.asarray(s.push(w[:, sl])["p_now"]))
            want = np.concatenate(want, axis=0)
            assert p.shape == want.shape
            np.testing.assert_allclose(p, want, rtol=0, atol=1e-5)

        assert server.stats["underruns"] == 0
    finally:
        c1.close()
        c2.close()
        server.stop()


def test_stream_slot_exhaustion_and_recycle():
    model = VapModel.init(jax.random.key(1), CONF)
    server = VapStreamServer(model, streams=1, context_time=1.0, hop_frames=5)
    server.start(port=PORT + 1)
    a = VapStreamClient(port=PORT + 1, timeout_s=60)
    b = VapStreamClient(port=PORT + 1, timeout_s=60)
    try:
        a.open()
        with pytest.raises(ValueError, match="no free stream slots"):
            b.open()
        a.close()
        assert b.open() == 0  # the slot is recycled
    finally:
        b.close()
        server.stop()


def test_tick_fifo_resets_and_requeue():
    """Unit-level tick semantics: two chunks queued within one tick window
    are consumed FIFO over TWO ticks (no audio drop, every req_id
    replied); open-time slot resets are applied by the tick thread (the
    receiver thread must not touch streamer state — lost-update race)."""
    model = VapModel.init(jax.random.key(2), CONF)
    server = VapStreamServer(model, streams=2, context_time=1.0, hop_frames=2)
    server.streamer.reset()
    server.sessions[0] = b"client"
    server._resets.add(0)
    c1 = np.full((2, server.hop_samples), 0.1, np.float32)
    c2 = -c1
    server.pending[0] = [("r1", c1), ("r2", c2)]

    replies = server._tick()
    assert set(replies) == {0} and replies[0][0] == "r1"
    assert not server._resets              # reset applied at tick time
    assert server._work.is_set()           # queued chunk triggers next tick
    assert server.pending[0][0][0] == "r2"

    replies = server._tick()
    assert replies[0][0] == "r2"
    assert 0 not in server.pending


def test_idle_session_evicted():
    """A client that vanishes without 'close' must not occupy its slot
    forever: _evict_idle reclaims it after session_timeout_s."""
    import time

    model = VapModel.init(jax.random.key(3), CONF)
    server = VapStreamServer(
        model, streams=1, context_time=1.0, hop_frames=2,
        session_timeout_s=0.01,
    )
    server.sessions[0] = b"gone"
    server.last_seen[0] = time.time() - 1.0
    server.pending[0] = [("r", np.zeros((2, server.hop_samples), np.float32))]
    server._evict_idle()
    assert server.sessions == {} and server.pending == {}
    assert server.stats["evictions"] == 1


def test_recv_matching_discards_stale_replies():
    """After a receive timeout, the late reply must not be returned as the
    NEXT request's result: _recv_matching drops mismatched req_ids."""
    import json

    from voiceactivityprojection_tpu.inference.server import _recv_matching

    class FakeSock:
        def __init__(self, frames):
            self.frames = list(frames)

        def recv_multipart(self):
            return self.frames.pop(0)

    stale = [json.dumps({"req_id": 1, "keys": [], "shapes": {}}).encode(), b""]
    good = [json.dumps({"req_id": 2, "keys": [], "shapes": {}}).encode(), b"xy"]
    h, payload = _recv_matching(FakeSock([stale, good]), 2)
    assert h["req_id"] == 2 and payload == b"xy"

    err = [json.dumps({"req_id": 3, "error": "boom"}).encode()]
    with pytest.raises(ValueError, match="boom"):
        _recv_matching(FakeSock([stale, err]), 3)
