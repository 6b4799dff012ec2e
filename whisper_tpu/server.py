"""JSON-lines transcription server over the continuous batcher.

The Python analog of the native daemon (`runtime/wtpu_transcribe.cpp
--serve`), upgraded with continuous batching: concurrent client requests
share the fixed-slot lockstep decoder (whisper_tpu/continuous.py), so K
clients cost ~one batched decode per 30 s window round instead of K
sequential transcriptions.

Protocol (mirrors the native daemon): a client connects to the unix socket,
sends ONE JSON line, and receives ONE JSON line back:

    -> {"audio": "/path/to/file.flac"}                 (path on the server)
    <- {"text": "...", "segments": [...], "language": "en", "duration": 11.0}
    <- {"error": "..."}                                 (on failure)

Optional request fields: "language" overrides auto-detection when the
server has no pinned language (an error when it contradicts a pinned one).
Every other ContinuousBatcher option is fixed at server construction
(slots, beam size, ...) — per-request options would change compiled
shapes, defeating the single-compile design.

LIVE STREAMING sessions (chunked audio in, partials out): a first line
`{"stream": true, ...}` upgrades the connection to a bidirectional session
backed by StreamingTranscriber (whisper_tpu/streaming.py):

    -> {"stream": true, "language": "en", "partial_hop_s": 1.0,
        "word_timestamps": false}
    <- {"ack": true}
    -> {"pcm": "<base64 float32 LE mono @16 kHz>"}      (repeat per chunk;
    -> {"pcm16": "<base64 int16 LE mono @16 kHz>"}       either encoding)
    <- {"segment": {..., "partial": true}}               (advisory, anytime)
    <- {"segment": {...}}                                (final, anytime)
    -> {"end": true}
    <- {"segment": {...}}                                (remaining finals)
    <- {"done": true, "text": ..., "language": ..., "duration": ...}

Partials are flagged `"partial": true` and are superseded by later lines;
final segments are bit-identical to `transcribe()` on the concatenated
audio (the StreamingTranscriber contract). `language` may be omitted on
multilingual models: the session auto-detects on its first finalized
window. Keep each pcm line under 1 MiB (~6 s of float32 audio) — ~1 s
chunks give the best partial latency.

Threading model: client sockets are read on acceptor threads (pure IO,
including base64 decode); everything that touches JAX — submit (device
mel), the lockstep rounds, and streaming feed()/flush() decodes — runs on
the single serve_forever() thread. Responses are written by that thread as
tickets resolve / sessions emit. A streaming window decode and a batch
round interleave at window granularity.

Usage:

    python -m whisper_tpu.server /tmp/wtpu.sock --model turbo --slots 4
    # or programmatically:
    srv = TranscriptionServer(model, "/tmp/wtpu.sock", slots=4, language="en")
    srv.serve_forever()
"""

import base64
import json
import os
import queue
import socket
import threading
import time
from typing import Dict, Optional

import numpy as np

from .continuous import ContinuousBatcher
from .streaming import StreamingTranscriber


class _StreamSession:
    """Server-side state of one live streaming connection."""

    __slots__ = ("conn", "st", "fed_samples", "dead")

    def __init__(self, conn: socket.socket, st: StreamingTranscriber):
        self.conn = conn
        self.st = st
        self.fed_samples = 0
        self.dead = False


# per-session knobs a streaming client may set on its opening line; all
# other options come from the server's construction-time defaults
_STREAM_SESSION_KEYS = ("language", "partial_hop_s", "word_timestamps", "task")


class TranscriptionServer:
    def __init__(self, model, socket_path: str, slots: int = 4, **batcher_options):
        self.socket_path = socket_path
        self.model = model
        self._batcher_options = dict(batcher_options)
        self._make_batcher = lambda: ContinuousBatcher(
            model, slots=slots, **batcher_options
        )
        self.batcher = self._make_batcher()
        self._requests: "queue.Queue" = queue.Queue()  # (kind, conn, payload)
        self._conn_for_ticket: Dict[int, socket.socket] = {}
        self._streams: Dict[int, _StreamSession] = {}  # keyed by id(conn)
        self._stop = threading.Event()
        self._listener: Optional[socket.socket] = None
        # reader threads enqueue under this lock while the flag is open;
        # shutdown flips it under the same lock BEFORE draining, so no
        # (conn, payload) can land after the one-shot drain (the client
        # would block on its reply line forever)
        self._queue_open = True
        self._queue_lock = threading.Lock()

    # ------------------------------------------------------------------ IO

    def _acceptor(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return  # listener closed
            threading.Thread(
                target=self._read_request, args=(conn,), daemon=True
            ).start()

    REQUEST_TIMEOUT_S = 30.0
    STREAM_IDLE_TIMEOUT_S = 300.0  # a live mic pauses, but not for 5 min
    MAX_REQUEST_BYTES = 1 << 20  # one JSON line (a path, or ~6 s of pcm)
    MAX_STREAM_PENDING_S = 600.0  # undecoded backlog cap per session

    def _read_request(self, conn: socket.socket):
        try:
            conn.settimeout(self.REQUEST_TIMEOUT_S)
            buf = b""
            while b"\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                buf += chunk
                if len(buf) > self.MAX_REQUEST_BYTES:
                    raise ValueError("request exceeds 1 MiB")
            conn.settimeout(None)  # the decode may legitimately take longer
            line, _, rest = buf.partition(b"\n")
            payload = json.loads(line.decode() or "{}")
        except Exception as e:  # malformed/slow request: answer and close here
            self._reply(conn, {"error": f"bad request: {e}"})
            return
        if payload.get("stream"):
            if self._enqueue(("stream_open", conn, payload)):
                self._read_stream(conn, rest)
            else:
                self._reply(conn, {"error": "server shutting down"})
            return
        if not self._enqueue(("request", conn, payload)):
            self._reply(conn, {"error": "server shutting down"})

    def _enqueue(self, item) -> bool:
        with self._queue_lock:
            if self._queue_open:
                self._requests.put(item)
                return True
        return False

    def _read_stream(self, conn: socket.socket, buf: bytes):
        """Reader loop of one streaming session: parse JSON lines, decode
        base64 PCM on this IO thread, enqueue numpy chunks for the serve
        thread. Runs until {"end": true}, EOF, or a protocol error."""
        enqueued_samples = 0  # this thread is the only enqueuer for conn
        session_seen = False
        try:
            conn.settimeout(self.STREAM_IDLE_TIMEOUT_S)
            while True:
                while b"\n" not in buf:
                    chunk = conn.recv(65536)
                    if not chunk:  # client vanished: drop without replies
                        self._enqueue(("stream_abort", conn, None))
                        return
                    buf += chunk
                    if len(buf) > self.MAX_REQUEST_BYTES:
                        raise ValueError("pcm line exceeds 1 MiB; send smaller chunks")
                line, _, buf = buf.partition(b"\n")
                if not line.strip():
                    continue
                msg = json.loads(line.decode())
                if msg.get("end"):
                    self._enqueue(("stream_end", conn, None))
                    return
                if "pcm" in msg:
                    audio = np.frombuffer(
                        base64.b64decode(msg["pcm"]), dtype="<f4"
                    ).astype(np.float32)
                elif "pcm16" in msg:
                    audio = (
                        np.frombuffer(base64.b64decode(msg["pcm16"]), dtype="<i2")
                        .astype(np.float32)
                        / 32768.0
                    )
                else:
                    raise ValueError("stream line must carry pcm/pcm16/end")
                # backpressure: stop reading the socket while the serve
                # thread is more than MAX_STREAM_PENDING_S of audio behind,
                # so the queue stays bounded and the client sees TCP
                # pushback instead of the server buffering without limit
                waited_s = 0.0
                while True:
                    sess = self._streams.get(id(conn))
                    if sess is not None:
                        session_seen = True
                        if sess.dead:
                            return
                        fed = sess.fed_samples
                    elif session_seen:
                        return  # session closed server-side; stop reading
                    else:
                        fed = 0  # stream_open still queued
                    if (
                        enqueued_samples - fed
                    ) / 16000.0 <= self.MAX_STREAM_PENDING_S:
                        break
                    if waited_s > self.STREAM_IDLE_TIMEOUT_S:
                        raise ValueError(
                            "server backlogged beyond the stream cap; "
                            "aborting session"
                        )
                    time.sleep(0.05)
                    waited_s += 0.05
                enqueued_samples += len(audio)
                self._enqueue(("stream_feed", conn, audio))
        except Exception as e:
            # the serve thread owns the session: let it report and clean up
            self._enqueue(("stream_fail", conn, f"{type(e).__name__}: {e}"))

    @staticmethod
    def _json(obj: dict) -> bytes:
        # segments may carry numpy scalars (seek/start/end); item() unwraps
        return (
            json.dumps(
                obj, default=lambda o: o.item() if hasattr(o, "item") else str(o)
            )
            + "\n"
        ).encode()

    @classmethod
    def _reply(cls, conn: socket.socket, obj: dict):
        try:
            conn.sendall(cls._json(obj))
        except OSError:
            pass
        finally:
            conn.close()

    # ---------------------------------------------------------------- serve

    def _admit(self, block: bool):
        try:
            if block:
                kind, conn, payload = self._requests.get(timeout=0.05)
            else:
                kind, conn, payload = self._requests.get_nowait()
        except queue.Empty:
            return
        if kind != "request":
            self._stream_event(kind, conn, payload)
            return
        audio = payload.get("audio")
        if not isinstance(audio, str):
            self._reply(conn, {"error": "request must carry an 'audio' path"})
            return
        try:
            ticket = self.batcher.submit(audio, language=payload.get("language"))
        except Exception as e:
            self._reply(conn, {"error": f"{type(e).__name__}: {e}"})
            return
        if self.batcher.ready(ticket):  # sub-second audio resolves at submit
            self._reply(conn, self.batcher.pop(ticket))
        else:
            self._conn_for_ticket[ticket] = conn

    # ------------------------------------------------------------ streaming

    def _stream_send(self, sess: _StreamSession, obj: dict) -> bool:
        if sess.dead:
            return False
        try:
            sess.conn.sendall(self._json(obj))
            return True
        except OSError:
            sess.dead = True
            return False

    def _stream_event(self, kind: str, conn: socket.socket, payload):
        """Serve-thread half of a streaming session: every feed()/flush()
        (and therefore every JAX decode) happens here."""
        key = id(conn)
        if kind == "stream_open":
            opts = dict(self._batcher_options)
            opts.pop("language", None)  # sessions pin/detect independently
            opts.update(
                {k: payload[k] for k in _STREAM_SESSION_KEYS if k in payload}
            )
            try:
                sess = _StreamSession(conn, StreamingTranscriber(self.model, **opts))
            except Exception as e:
                self._reply(conn, {"error": f"{type(e).__name__}: {e}"})
                return
            self._streams[key] = sess
            self._stream_send(sess, {"ack": True})
            return
        sess = self._streams.get(key)
        if sess is None:
            return  # already failed/closed
        if kind == "stream_feed":
            # backlog control lives on the READER thread (_read_stream stops
            # reading while enqueued-but-unprocessed audio exceeds
            # MAX_STREAM_PENDING_S); feed() decodes every complete window
            # synchronously, so decode lag here never exceeds one window
            sess.fed_samples += len(payload)
            try:
                for seg in sess.st.feed(payload):
                    self._stream_send(sess, {"segment": seg})
            except Exception as e:
                self._stream_fail(sess, f"{type(e).__name__}: {e}")
        elif kind == "stream_end":
            try:
                for seg in sess.st.flush():
                    self._stream_send(sess, {"segment": seg})
                res = sess.st.result
                self._stream_send(
                    sess,
                    {
                        "done": True,
                        "text": res["text"],
                        "language": res["language"],
                        "duration": sess.fed_samples / 16000.0,
                    },
                )
            except Exception as e:
                self._stream_fail(sess, f"{type(e).__name__}: {e}")
                return
            self._stream_close(sess)
        elif kind == "stream_fail":
            self._stream_fail(sess, payload)
        elif kind == "stream_abort":  # client EOF: nobody is listening
            sess.dead = True
            self._stream_close(sess)

    def _stream_fail(self, sess: _StreamSession, message: str):
        self._stream_send(sess, {"error": message})
        self._stream_close(sess)

    def _stream_close(self, sess: _StreamSession):
        self._streams.pop(id(sess.conn), None)
        try:
            sess.conn.close()
        except OSError:
            pass

    def serve_forever(self):
        """Bind, accept, and run lockstep rounds until shutdown()."""
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        self._listener = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._listener.bind(self.socket_path)
        self._listener.listen(64)
        threading.Thread(target=self._acceptor, daemon=True).start()

        while not self._stop.is_set():
            # drain every queued request into the batcher, then one round
            self._admit(block=not self._conn_for_ticket)
            while not self._requests.empty():
                self._admit(block=False)
            if self._conn_for_ticket:
                try:
                    self.batcher.step()
                except Exception as e:  # a failed round must not hang clients
                    err = {"error": f"decode round failed: {type(e).__name__}: {e}"}
                    for conn in self._conn_for_ticket.values():
                        self._reply(conn, err)
                    self._conn_for_ticket.clear()
                    # the failed round's streams still occupy slots; start
                    # clean (jit caches live on the model, so no recompile)
                    # but carry the monotonic counters over
                    stats = self.batcher.stats
                    self.batcher = self._make_batcher()
                    self.batcher.stats = stats
                    continue
                for ticket in [t for t in self._conn_for_ticket if self.batcher.ready(t)]:
                    # pop() evicts the ticket's state — a daemon must not
                    # accumulate one stream's segments per request served
                    self._reply(
                        self._conn_for_ticket.pop(ticket), self.batcher.pop(ticket)
                    )
        self._listener.close()
        # close the queue BEFORE draining: in-flight reader threads now
        # answer the shutdown error themselves instead of enqueueing after
        # the drain (which would hang their clients)
        with self._queue_lock:
            self._queue_open = False
        # answer everything still in flight — clients block on their reply
        # line, so silently dropping them would hang each until its own
        # timeout
        err = {"error": "server shutting down"}
        while True:
            try:
                kind, conn, _ = self._requests.get_nowait()
            except queue.Empty:
                break
            if kind in ("request", "stream_open"):
                self._reply(conn, err)
            # feed/end events belong to sessions closed below
        for conn in self._conn_for_ticket.values():
            self._reply(conn, err)
        self._conn_for_ticket.clear()
        for sess in list(self._streams.values()):
            self._stream_fail(sess, "server shutting down")
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)

    def shutdown(self):
        self._stop.set()
        # unblock a pending accept()
        try:
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.connect(self.socket_path)
            s.close()
        except OSError:
            pass


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="continuous-batching transcription server (unix socket)"
    )
    parser.add_argument("socket", help="unix socket path to listen on")
    parser.add_argument("--model", default="turbo")
    parser.add_argument("--slots", type=int, default=4)
    parser.add_argument("--language", default=None)
    parser.add_argument("--beam_size", type=int, default=None)
    parser.add_argument("--temperature", type=float, default=None)
    parser.add_argument(
        "--word_timestamps",
        action="store_true",
        help="segments carry per-word times",
    )
    args = parser.parse_args(argv)

    from . import load_model

    model = load_model(args.model)
    kw = {}
    if args.beam_size is not None:
        kw["beam_size"] = args.beam_size
    if args.temperature is not None:
        kw["temperature"] = args.temperature
    srv = TranscriptionServer(
        model, args.socket, slots=args.slots, language=args.language,
        word_timestamps=args.word_timestamps, **kw
    )
    print(f"serving on {args.socket} (slots={args.slots})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
