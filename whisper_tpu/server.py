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

Threading model: client sockets are read on acceptor threads (pure IO);
everything that touches JAX — submit (device mel) and the lockstep rounds —
runs on the single serve_forever() thread. Responses are written by that
thread as tickets resolve.

Usage:

    python -m whisper_tpu.server /tmp/wtpu.sock --model turbo --slots 4
    # or programmatically:
    srv = TranscriptionServer(model, "/tmp/wtpu.sock", slots=4, language="en")
    srv.serve_forever()
"""

import json
import os
import queue
import socket
import threading
from typing import Dict, Optional

from .continuous import ContinuousBatcher


class TranscriptionServer:
    def __init__(self, model, socket_path: str, slots: int = 4, **batcher_options):
        self.socket_path = socket_path
        self._make_batcher = lambda: ContinuousBatcher(
            model, slots=slots, **batcher_options
        )
        self.batcher = self._make_batcher()
        self._requests: "queue.Queue" = queue.Queue()  # (conn, payload dict)
        self._conn_for_ticket: Dict[int, socket.socket] = {}
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
    MAX_REQUEST_BYTES = 1 << 20  # a request is one JSON line with a path

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
            payload = json.loads(buf.decode() or "{}")
        except Exception as e:  # malformed/slow request: answer and close here
            self._reply(conn, {"error": f"bad request: {e}"})
            return
        with self._queue_lock:
            enqueued = self._queue_open
            if enqueued:
                self._requests.put((conn, payload))
        if not enqueued:  # shutdown drain already ran — answer here
            self._reply(conn, {"error": "server shutting down"})

    @staticmethod
    def _reply(conn: socket.socket, obj: dict):
        try:
            conn.sendall((json.dumps(obj) + "\n").encode())
        except OSError:
            pass
        finally:
            conn.close()

    # ---------------------------------------------------------------- serve

    def _admit(self, block: bool):
        try:
            if block:
                conn, payload = self._requests.get(timeout=0.05)
            else:
                conn, payload = self._requests.get_nowait()
        except queue.Empty:
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
                conn, _ = self._requests.get_nowait()
            except queue.Empty:
                break
            self._reply(conn, err)
        for conn in self._conn_for_ticket.values():
            self._reply(conn, err)
        self._conn_for_ticket.clear()
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
