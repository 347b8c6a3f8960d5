"""Batched inference server tests: round-trip, micro-batching, errors."""

import threading

import numpy as np
import pytest
import jax

zmq = pytest.importorskip("zmq")

from voiceactivityprojection_tpu.config import VapConfig
from voiceactivityprojection_tpu.inference.server import VapClient, VapServer
from voiceactivityprojection_tpu.models.vap import VapModel

pytestmark = [pytest.mark.inference, pytest.mark.slow]

PORT = 5591


@pytest.fixture(scope="module")
def server_and_client():
    conf = VapConfig(dim=16, encoder_dim=16, channel_layers=1, cross_layers=1)
    model = VapModel.init(jax.random.key(0), conf)
    server = VapServer(model, batch_size=4, chunk_time=2.0, max_wait_ms=30)
    server.start(port=PORT)
    client = VapClient(port=PORT, timeout_s=120)
    yield server, client
    client.close()
    server.stop()


def test_single_request(server_and_client):
    server, client = server_and_client
    w = np.random.default_rng(0).normal(size=(2, 32000)).astype(np.float32) * 0.1
    out = client.infer(w)
    assert set(out) == {"p_now", "p_future", "vad", "H"}
    assert out["p_now"].shape == (100, 2)  # 2 s * 50 Hz
    np.testing.assert_allclose(out["p_now"].sum(-1), 1.0, atol=1e-3)


def test_short_request_trimmed(server_and_client):
    server, client = server_and_client
    w = np.random.default_rng(1).normal(size=(2, 16000)).astype(np.float32) * 0.1
    out = client.infer(w)
    assert out["p_now"].shape == (50, 2)  # trimmed to the real 1 s


def test_concurrent_requests_batch(server_and_client):
    server, client = server_and_client
    before = server.stats["batches"]
    results = [None] * 4
    rng = np.random.default_rng(2)
    waves = [rng.normal(size=(2, 32000)).astype(np.float32) * 0.1 for _ in range(4)]

    def call(i):
        c = VapClient(port=PORT, timeout_s=120)
        results[i] = c.infer(waves[i])
        c.close()

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in results)
    # micro-batching: 4 concurrent requests should take < 4 batches
    assert server.stats["batches"] - before <= 3


def test_oversized_request_rejected(server_and_client):
    server, client = server_and_client
    w = np.zeros((2, 64000), dtype=np.float32)  # 4 s > 2 s chunk
    with pytest.raises(ValueError, match="expected"):
        client.infer(w)


def test_malformed_request_does_not_kill_server(server_and_client):
    """A bad packet (payload/shape mismatch, bad JSON, wrong frame count)
    must get an error reply — not silently kill the receiver thread."""
    import json

    server, client = server_and_client
    ctx = zmq.Context()
    raw = ctx.socket(zmq.DEALER)
    raw.connect(f"tcp://localhost:{PORT}")
    raw.setsockopt(zmq.RCVTIMEO, 30_000)
    try:
        # payload shorter than the declared shape
        hdr = json.dumps({"req_id": 99, "shape": [2, 32000]}).encode()
        raw.send_multipart([hdr, b"\x00" * 64])
        h, _ = raw.recv_multipart()
        assert "error" in json.loads(h)

        # invalid JSON header
        raw.send_multipart([b"{not json", b""])
        h, _ = raw.recv_multipart()
        assert "error" in json.loads(h)

        # wrong frame count
        raw.send_multipart([b"only-one-frame"])
        h, _ = raw.recv_multipart()
        assert "error" in json.loads(h)
    finally:
        raw.close(0)
        ctx.term()

    # server still serves well-formed requests afterwards
    w = np.random.default_rng(3).normal(size=(2, 32000)).astype(np.float32) * 0.1
    out = client.infer(w)
    assert out["p_now"].shape == (100, 2)
