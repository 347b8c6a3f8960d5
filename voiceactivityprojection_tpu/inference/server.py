"""Batched inference server for production serving.

The reference has no serving layer beyond the single-client SDS loop; this
module adds one designed for TPU economics: requests are MICRO-BATCHED
into a fixed (B, 2, n_samples) shape — one compiled program, full MXU
utilization — and dispatched when the batch fills or a deadline passes.

Transport is ZMQ ROUTER/DEALER (same dependency family as the reference's
SDS publisher): requests/replies are multipart [header-json, f32-bytes].

    server = VapServer(model, batch_size=16, chunk_time=20.0)
    server.serve(port=5590)            # blocking; or .start() for a thread

    client = VapClient(port=5590)
    out = client.infer(waveform)       # (2, n) float32 -> dict of arrays

Requests shorter than chunk_time are zero-padded (results trimmed);
longer ones are rejected with an error reply (use VapExtractor for long
audio — the server targets fixed-latency online traffic).
"""

from __future__ import annotations

import json
import queue
import threading
import time
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp


def _join_serve_thread(t: Optional[threading.Thread]) -> None:
    """Wait for a start()-spawned serve thread to finish its socket/ctx
    teardown: returning from stop() while the daemon thread is mid
    zmq ctx.term() aborts the process at interpreter exit."""
    if t is not None and t is not threading.current_thread() and t.is_alive():
        t.join(timeout=5)


class _Request:
    __slots__ = ("ident", "req_id", "waveform", "n_frames")

    def __init__(self, ident, req_id, waveform, n_frames):
        self.ident = ident
        self.req_id = req_id
        self.waveform = waveform
        self.n_frames = n_frames


class VapServer:
    def __init__(
        self,
        model,
        batch_size: int = 16,
        chunk_time: float = 20.0,
        max_wait_ms: float = 25.0,
        outputs: tuple = ("p_now", "p_future", "vad", "H"),
    ):
        self.model = model
        self.batch_size = batch_size
        self.sample_rate = model.conf.sample_rate
        self.frame_hz = model.conf.frame_hz
        self.n_samples = int(chunk_time * self.sample_rate)
        self.max_wait_s = max_wait_ms / 1000.0
        self.outputs = outputs
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "batch_fill_sum": 0}

    # ------------------------------------------------------------------
    def _run_batch(self, batch: List[_Request]) -> List[Dict[str, np.ndarray]]:
        stacked = np.zeros((self.batch_size, 2, self.n_samples), dtype=np.float32)
        for i, r in enumerate(batch):
            stacked[i] = r.waveform
        out = self.model.probs(jnp.asarray(stacked))
        out = {k: np.asarray(v) for k, v in out.items() if k in self.outputs}
        results = []
        for i, r in enumerate(batch):
            results.append({k: v[i, : r.n_frames] for k, v in out.items()})
        self.stats["batches"] += 1
        self.stats["batch_fill_sum"] += len(batch)
        return results

    def _collect_batch(self) -> List[_Request]:
        """Block for the first request, then fill until full or deadline."""
        first = self.queue.get()
        if first is None:  # shutdown sentinel
            return []
        batch = [first]
        deadline = time.time() + self.max_wait_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                nxt = self.queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    # ------------------------------------------------------------------
    def serve(self, port: int = 5590, ready_event: Optional[threading.Event] = None):
        import zmq

        ctx = zmq.Context()
        sock = ctx.socket(zmq.ROUTER)
        try:
            sock.bind(f"tcp://*:{port}")
        except Exception as e:
            # surface bind failures to start() — a silently-dead server
            # leaves clients talking to whatever already owns the port
            self._serve_error = e
            if ready_event is not None:
                ready_event.set()
            sock.close(0)  # MUST precede ctx.term(): zmq_ctx_term blocks
            ctx.term()     # until every socket in the context is closed
            raise
        poller = zmq.Poller()
        poller.register(sock, zmq.POLLIN)
        # one lock for EVERY socket op — zmq sockets are not thread-safe
        # across threads even for recv-vs-send (see VapStreamServer.serve)
        send_lock = threading.Lock()
        if ready_event is not None:
            ready_event.set()

        def receiver():
            while not self._stop.is_set():
                try:
                    with send_lock:
                        ready = dict(poller.poll(timeout=0))
                        frames = sock.recv_multipart() if ready else None
                    if frames is None:
                        time.sleep(0.002)
                        continue
                except zmq.ZMQError:
                    return  # socket closed during shutdown
                try:
                    # any malformed request (wrong frame count, bad JSON,
                    # payload/shape mismatch) must not kill the receiver —
                    # one bad packet would otherwise brick the server
                    ident, header, payload = frames
                    h = json.loads(header)
                    wf = np.frombuffer(payload, dtype=np.float32).reshape(
                        h["shape"]
                    )
                except Exception as e:
                    if frames:
                        reply = {"req_id": None,
                                 "error": f"malformed request: {e}"}
                        with send_lock:
                            sock.send_multipart(
                                [frames[0], json.dumps(reply).encode(), b""]
                            )
                    continue
                if wf.ndim != 2 or wf.shape[0] != 2 or wf.shape[1] > self.n_samples:
                    reply = {"req_id": h.get("req_id"), "error":
                             f"expected (2, <= {self.n_samples}), got {list(wf.shape)}"}
                    with send_lock:
                        sock.send_multipart([ident, json.dumps(reply).encode(), b""])
                    continue
                n_frames = int(wf.shape[1] / self.sample_rate * self.frame_hz)
                padded = np.zeros((2, self.n_samples), dtype=np.float32)
                padded[:, : wf.shape[1]] = wf
                self.queue.put(_Request(ident, h.get("req_id"), padded, n_frames))
                self.stats["requests"] += 1

        rt = threading.Thread(target=receiver, daemon=True)
        rt.start()

        try:
            while not self._stop.is_set():
                batch = self._collect_batch()
                if not batch:
                    continue
                results = self._run_batch(batch)
                for r, res in zip(batch, results):
                    header = {
                        "req_id": r.req_id,
                        "keys": list(res),
                        "shapes": {k: list(v.shape) for k, v in res.items()},
                    }
                    payload = b"".join(
                        np.ascontiguousarray(res[k], dtype=np.float32).tobytes()
                        for k in res
                    )
                    with send_lock:
                        sock.send_multipart(
                            [r.ident, json.dumps(header).encode(), payload]
                        )
        finally:
            self._stop.set()
            rt.join(timeout=2)
            sock.close(0)
            ctx.term()

    def start(self, port: int = 5590) -> threading.Thread:
        ready = threading.Event()
        self._serve_error = None
        t = threading.Thread(target=self.serve, args=(port, ready), daemon=True)
        self._thread = t
        t.start()
        ok = ready.wait(timeout=30)
        if self._serve_error is not None:
            raise RuntimeError(
                f"server failed to start on port {port}"
            ) from self._serve_error
        if not ok:
            raise RuntimeError(
                f"server did not become ready on port {port} within 30s"
            )
        return t

    def stop(self):
        self._stop.set()
        self.queue.put(None)
        _join_serve_thread(getattr(self, "_thread", None))


class VapStreamServer:
    """Streaming session server: S live dialogs on one device.

    Built on ``BatchedKVStreamer`` (inference/streaming_kv.py): each tick
    advances ALL sessions one hop in a single dispatch — O(1) transformer
    work per frame per stream. Protocol (ROUTER, multipart
    [ident, header-json, payload]):

      {"op": "open"}                    -> {"session": i, "hop_samples": n}
      {"op": "push", "session": i} + (2, hop_samples) f32 bytes
                                        -> {"keys", "shapes"} + outputs for
                                           the NEW frames of that session
      {"op": "close", "session": i}     -> {"closed": i}

    A tick fires when every active session has a pending chunk, or
    ``max_wait_ms`` after the first pending chunk arrived; sessions that
    miss the deadline are advanced with SILENCE (zeros) and counted in
    ``stats["underruns"]`` — live audio cannot pause for a slow client.

    RECYCLED-SLOT APPROXIMATION: a slot reopened mid-service resets its
    encoder rows to zeros at STEADY tail lengths (encoder_streaming_exact
    ``reset_rows``); a genuinely fresh stream instead primes with
    symmetric-pad tails and emits one fewer frame on its first push. The
    batched tick's fixed frames-per-slot shape cannot represent that
    ragged first push, so a recycled session's first ~0.12 s of features
    (one conv receptive field) deviates from a solo run before converging
    to batch-exact output; the KV transformer state is exact-fresh from
    the start. Measured consequence: only the first 1-2 hops differ.
    """

    def __init__(
        self,
        model,
        streams: int = 16,
        context_time: float = 20.0,
        hop_frames: int = 1,
        max_wait_ms: float = 15.0,
        outputs: tuple = ("p_now", "p_future", "vad", "H"),
        session_timeout_s: Optional[float] = 60.0,
    ):
        from voiceactivityprojection_tpu.inference.streaming_kv import (
            BatchedKVStreamer,
        )

        self.model = model
        self.streams = streams
        self.streamer = BatchedKVStreamer(
            model, streams=streams, context_time=context_time,
            hop_frames=hop_frames,
        )
        self.hop_samples = self.streamer.hop_samples
        self.max_wait_s = max_wait_ms / 1000.0
        self.outputs = outputs
        self.session_timeout_s = session_timeout_s
        self.sessions: Dict[int, bytes] = {}  # slot -> client ident
        # slot -> FIFO of (req_id, chunk): a client that pushes twice
        # within one tick window must not lose audio — extra chunks wait
        # for the next ticks and every req_id gets its reply
        self.pending: Dict[int, List[tuple]] = {}
        self.last_seen: Dict[int, float] = {}  # slot -> last push/open time
        # slots to recycle, applied by the TICK thread before it touches
        # streamer state — reset_stream from the receiver thread would race
        # the tick's state replacement (lost update -> stale-cache leak)
        self._resets: set = set()
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._stop = threading.Event()
        self.stats = {"ticks": 0, "pushes": 0, "underruns": 0, "evictions": 0}
        # slot -> silence-advances while this session owned it; reported in
        # the close reply so clients know whether their effective audio
        # equals exactly what they pushed (soak contamination checks)
        self.slot_underruns: Dict[int, int] = {}

    # ------------------------------------------------------------------
    def _tick(self) -> Dict[int, tuple]:
        """Advance every slot one hop; returns {slot: (req_id, owner,
        outputs)} where ``owner`` is the client ident that owned the slot
        when its chunk was snapshotted — replies are addressed to the
        OWNER, not whoever holds the slot at send time (a close+reopen by
        a different client mid-tick must not receive the old dialog's
        outputs)."""
        with self._lock:
            resets = list(self._resets)
            self._resets.clear()
            todo = {}
            for slot, fifo in list(self.pending.items()):
                req_id, chunk = fifo.pop(0)
                todo[slot] = (req_id, self.sessions.get(slot), chunk)
                if not fifo:
                    del self.pending[slot]
            if self.pending:
                self._work.set()  # queued chunks remain: tick again
            active = dict(self.sessions)
        for slot in resets:
            self.streamer.reset_stream(slot)
        chunks = np.zeros((self.streams, 2, self.hop_samples), dtype=np.float32)
        for slot, (_, _, chunk) in todo.items():
            chunks[slot] = chunk
        missed = [slot for slot in active if slot not in todo]
        self.stats["underruns"] += len(missed)
        with self._lock:
            for slot in missed:
                self.slot_underruns[slot] = self.slot_underruns.get(slot, 0) + 1
        out = self.streamer.push(chunks)
        out = {k: v for k, v in out.items() if k in self.outputs}
        # ONE host fetch for all outputs: each np.asarray of a device
        # array is a separate host round trip (~28 ms through a tunneled
        # host, and a sync even on local PCIe); packing the raveled
        # outputs into a single device buffer makes the tick pay exactly
        # one. Measured in the round-5 churn soak: 4 keys fetched
        # separately put the tick at ~175 ms through the tunnel.
        keys = list(out)
        shapes = {k: out[k].shape for k in keys}
        packed = np.asarray(
            jnp.concatenate([out[k].astype(jnp.float32).ravel() for k in keys])
        )
        unpacked = {}
        off = 0
        for k in keys:
            size = int(np.prod(shapes[k]))
            unpacked[k] = packed[off:off + size].reshape(shapes[k])
            off += size
        out = unpacked
        self.stats["ticks"] += 1
        return {
            slot: (req_id, owner, {k: v[:, slot] for k, v in out.items()})
            for slot, (req_id, owner, _) in todo.items()
        }

    def _evict_idle(self) -> None:
        """Reclaim slots whose client stopped pushing without 'close' —
        otherwise a crashed client occupies its slot forever and the
        server leaks capacity until restart."""
        if self.session_timeout_s is None:
            return
        cutoff = time.time() - self.session_timeout_s
        with self._lock:
            dead = [s for s, t in self.last_seen.items() if t < cutoff]
            for s in dead:
                self.sessions.pop(s, None)
                self.pending.pop(s, None)
                self.last_seen.pop(s, None)
                self.stats["evictions"] += 1

    def serve(self, port: int = 5595, ready_event: Optional[threading.Event] = None):
        import zmq

        self.streamer.reset()
        ctx = zmq.Context()
        sock = ctx.socket(zmq.ROUTER)
        try:
            sock.bind(f"tcp://*:{port}")
        except Exception as e:
            # surface bind failures to start() — a silently-dead server
            # leaves clients talking to whatever already owns the port
            self._serve_error = e
            if ready_event is not None:
                ready_event.set()
            sock.close(0)  # MUST precede ctx.term(): zmq_ctx_term blocks
            ctx.term()     # until every socket in the context is closed
            raise
        poller = zmq.Poller()
        poller.register(sock, zmq.POLLIN)
        # ONE lock serializes EVERY socket operation (recv, poll, send):
        # a zmq socket is not thread-safe even for distinct operations
        # from different threads — the receiver thread's recv racing the
        # tick thread's send aborts inside libzmq (object.cpp assert,
        # reproduced twice in the round-5 churn soak under load)
        sock_lock = threading.Lock()
        if ready_event is not None:
            ready_event.set()

        def reply(ident, header: dict, payload: bytes = b""):
            with sock_lock:
                sock.send_multipart([ident, json.dumps(header).encode(), payload])

        def receiver():
            while not self._stop.is_set():
                try:
                    with sock_lock:
                        ready = dict(poller.poll(timeout=0))
                        frames = sock.recv_multipart() if ready else None
                    if frames is None:
                        # poll outside the lock so reply() can interleave
                        time.sleep(0.002)
                        continue
                    ident, header, payload = frames
                except (zmq.ZMQError, ValueError):
                    if self._stop.is_set():
                        return
                    continue
                try:
                    h = json.loads(header)
                    op = h.get("op")
                    if op == "open":
                        with self._lock:
                            free = [i for i in range(self.streams)
                                    if i not in self.sessions]
                            if not free:
                                reply(ident, {"req_id": h.get("req_id"),
                                              "error": "no free stream slots"})
                                continue
                            slot = free[0]
                            self.sessions[slot] = ident
                            self.last_seen[slot] = time.time()
                            self.slot_underruns[slot] = 0
                            # recycled by the tick thread BEFORE the slot's
                            # first chunk is consumed (see _tick)
                            self._resets.add(slot)
                        reply(ident, {"req_id": h.get("req_id"), "session": slot,
                                      "hop_samples": self.hop_samples})
                    elif op == "push":
                        slot = int(h["session"])
                        chunk = np.frombuffer(payload, dtype=np.float32).reshape(
                            2, self.hop_samples
                        )
                        with self._lock:
                            if self.sessions.get(slot) != ident:
                                reply(ident, {"req_id": h.get("req_id"),
                                              "error": f"session {slot} not yours"})
                                continue
                            self.pending.setdefault(slot, []).append(
                                (h.get("req_id"), chunk)
                            )
                            self.last_seen[slot] = time.time()
                        self.stats["pushes"] += 1
                        self._work.set()
                    elif op == "close":
                        slot = int(h["session"])
                        with self._lock:
                            self.sessions.pop(slot, None)
                            self.pending.pop(slot, None)
                            self.last_seen.pop(slot, None)
                            underruns = self.slot_underruns.pop(slot, 0)
                        reply(ident, {"req_id": h.get("req_id"),
                                      "closed": slot,
                                      "underruns": underruns})
                    else:
                        reply(ident, {"req_id": h.get("req_id"),
                                      "error": f"unknown op {op!r}"})
                except Exception as e:  # one bad packet must not kill serving
                    reply(ident, {"req_id": None, "error": f"malformed: {e}"})

        rt = threading.Thread(target=receiver, daemon=True)
        rt.start()
        try:
            while not self._stop.is_set():
                self._evict_idle()
                if not self._work.wait(timeout=0.05):
                    continue
                # deadline: let the rest of the cohort arrive
                deadline = time.time() + self.max_wait_s
                while time.time() < deadline:
                    with self._lock:
                        if (self.sessions
                                and len(self.pending) >= len(self.sessions)):
                            break
                    time.sleep(0.001)
                self._work.clear()
                with self._lock:
                    if not self.pending:
                        continue  # spurious wake: never tick on silence only
                replies = self._tick()
                for slot, (req_id, owner, res) in replies.items():
                    header = {
                        "req_id": req_id,
                        "session": slot,
                        "keys": list(res),
                        "shapes": {k: list(v.shape) for k, v in res.items()},
                    }
                    payload = b"".join(
                        np.ascontiguousarray(res[k], dtype=np.float32).tobytes()
                        for k in res
                    )
                    # address the snapshot-time owner; drop if the slot
                    # changed hands (closed/evicted/reopened) since then
                    with self._lock:
                        still_owns = self.sessions.get(slot) == owner
                    if owner is not None and still_owns:
                        reply(owner, header, payload)
        finally:
            self._stop.set()
            rt.join(timeout=2)
            sock.close(0)
            ctx.term()

    def start(self, port: int = 5595) -> threading.Thread:
        ready = threading.Event()
        self._serve_error = None
        t = threading.Thread(target=self.serve, args=(port, ready), daemon=True)
        self._thread = t
        t.start()
        ok = ready.wait(timeout=30)
        if self._serve_error is not None:
            raise RuntimeError(
                f"stream server failed to start on port {port}"
            ) from self._serve_error
        if not ok:
            raise RuntimeError(
                f"stream server did not become ready on port {port} within 30s"
            )
        return t

    def stop(self):
        self._stop.set()
        self._work.set()
        _join_serve_thread(getattr(self, "_thread", None))


def _decode_payload(h: dict, payload: bytes) -> Dict[str, np.ndarray]:
    """Decode a reply's packed-f32 payload per its keys/shapes header
    (single owner for the wire format — both clients use it)."""
    out: Dict[str, np.ndarray] = {}
    offset = 0
    for k in h["keys"]:
        shape = h["shapes"][k]
        size = int(np.prod(shape))
        out[k] = np.frombuffer(
            payload, dtype=np.float32, count=size, offset=offset * 4
        ).reshape(shape)
        offset += size
    return out


def _recv_matching(sock, req_id, stale_plausible: bool = False):
    """Receive until the reply whose req_id matches ``req_id``; stale
    replies from a previously timed-out request are DISCARDED — the first
    TPU compile of a shape can outlast the client's RCVTIMEO, and without
    this the next call would silently return the wrong input's outputs.

    ``stale_plausible``: a malformed-request error reply carries req_id
    None; it is discarded as stale ONLY when a previous call on this
    socket timed out (so orphaned traffic can exist). Otherwise it must
    belong to the current request and is raised immediately — swallowing
    it would turn a descriptive server error into a silent RCVTIMEO."""
    import logging

    while True:
        parts = sock.recv_multipart()
        h = json.loads(parts[0])
        got = h.get("req_id")
        if got is not None and req_id is not None and got != req_id:
            continue
        if "error" in h:
            if got is None and req_id is not None and stale_plausible:
                logging.getLogger(__name__).warning(
                    "discarding stale error reply: %s", h["error"]
                )
                continue
            raise ValueError(h["error"])
        return h, (parts[1] if len(parts) > 1 else b"")


class VapStreamClient:
    """Client for ``VapStreamServer``: open a session, push hops, read the
    per-hop outputs for the new frames."""

    def __init__(self, port: int = 5595, host: str = "localhost",
                 timeout_s: float = 60.0, ctx=None):
        """``ctx``: optionally share one zmq.Context across many clients
        (contexts are thread-safe; sockets are per-thread). A harness
        spawning hundreds of short-lived clients MUST share one — each
        private context carries internal IO threads, and rapid
        create/terminate cycles abort inside libzmq (object.cpp assert,
        observed in the round-5 churn soak)."""
        import zmq

        self._own_ctx = ctx is None
        self.ctx = ctx if ctx is not None else zmq.Context()
        self.sock = self.ctx.socket(zmq.DEALER)
        self.sock.setsockopt(zmq.LINGER, 0)
        self.sock.connect(f"tcp://{host}:{port}")
        self.sock.setsockopt(zmq.RCVTIMEO, int(timeout_s * 1000))
        self.session: Optional[int] = None
        self.hop_samples: Optional[int] = None
        self._next_id = 0
        self._had_timeout = False  # stale replies possible only after one

    def _recv(self, req_id):
        try:
            return _recv_matching(self.sock, req_id,
                                  stale_plausible=self._had_timeout)
        except Exception as e:
            if "Resource temporarily unavailable" in repr(e):
                self._had_timeout = True  # orphaned reply may arrive later
            raise

    def open(self) -> int:
        req_id = self._next_id
        self._next_id += 1
        self.sock.send_multipart(
            [json.dumps({"op": "open", "req_id": req_id}).encode(), b""]
        )
        h, _ = self._recv(req_id)
        self.session = int(h["session"])
        self.hop_samples = int(h["hop_samples"])
        return self.session

    def push(self, chunk: np.ndarray) -> Dict[str, np.ndarray]:
        chunk = np.ascontiguousarray(chunk, dtype=np.float32)
        req_id = self._next_id
        self._next_id += 1
        header = {"op": "push", "session": self.session, "req_id": req_id}
        self.sock.send_multipart([json.dumps(header).encode(), chunk.tobytes()])
        h, payload = self._recv(req_id)
        return _decode_payload(h, payload)

    def close(self) -> Optional[dict]:
        """Close the session; returns the server's close reply header
        (carries ``underruns``: silence-advances while this session owned
        its slot) or None if the close handshake failed."""
        reply_h = None
        if self.session is not None:
            try:
                req_id = self._next_id
                self._next_id += 1
                self.sock.send_multipart(
                    [json.dumps({"op": "close", "session": self.session,
                                 "req_id": req_id}).encode(), b""]
                )
                reply_h, _ = self._recv(req_id)
            except Exception:
                pass
            self.session = None
        self.sock.close(0)
        if self._own_ctx:
            self.ctx.term()
        return reply_h


class VapClient:
    def __init__(self, port: int = 5590, host: str = "localhost", timeout_s: float = 60.0):
        import zmq

        self.ctx = zmq.Context()
        self.sock = self.ctx.socket(zmq.DEALER)
        self.sock.connect(f"tcp://{host}:{port}")
        self.sock.setsockopt(zmq.RCVTIMEO, int(timeout_s * 1000))
        self._next_id = 0
        self._had_timeout = False

    def infer(self, waveform: np.ndarray) -> Dict[str, np.ndarray]:
        waveform = np.ascontiguousarray(waveform, dtype=np.float32)
        req_id = self._next_id
        self._next_id += 1
        header = {"req_id": req_id, "shape": list(waveform.shape)}
        self.sock.send_multipart([json.dumps(header).encode(), waveform.tobytes()])
        try:
            h, payload = _recv_matching(self.sock, req_id,
                                        stale_plausible=self._had_timeout)
        except Exception as e:
            if "Resource temporarily unavailable" in repr(e):
                self._had_timeout = True
            raise
        return _decode_payload(h, payload)

    def close(self):
        self.sock.close(0)
        self.ctx.term()
