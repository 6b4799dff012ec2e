"""OpenAI-compatible HTTP transcription server over the continuous batcher.

`POST /v1/audio/transcriptions` (multipart/form-data, field `file`) — the
wire format of the OpenAI Whisper API — so off-the-shelf clients
(`openai.audio.transcriptions.create(...)`, curl scripts) point at this
server unchanged. Concurrent uploads share the fixed-slot lockstep decoder
(whisper_tpu/continuous.py): K in-flight requests cost ~one batched decode
per 30 s window round instead of K sequential transcriptions.

Stdlib only (http.server + email multipart parsing — no flask/fastapi, the
environment is hermetic). The reference has no serving story at all; this
and the unix-socket daemon (whisper_tpu/server.py, runtime/wtpu_transcribe
--serve) are the deployment surface the rebuild adds.

Endpoints:
  POST /v1/audio/transcriptions   multipart form: file (required),
                                  response_format (json | text |
                                  verbose_json; default json)
  POST /v1/audio/transcriptions/stream
                                  LIVE streaming: raw little-endian PCM
                                  body (Content-Length or chunked
                                  transfer-encoding; query params:
                                  encoding=f32|s16 [default f32],
                                  language, partial_hop_s,
                                  word_timestamps). The response streams
                                  back newline-delimited JSON as chunked
                                  transfer-encoding: {"segment": {...,
                                  "partial": true}} advisories between
                                  window closes, final segments
                                  bit-identical to batch transcribe(),
                                  then {"done": true, text, language,
                                  duration}. language omitted on a
                                  multilingual model auto-detects on the
                                  first finalized window.
  GET  /healthz                   {"ok": true, "model": ..., "slots": N}

Model/decoding options are fixed at server construction — per-request
options would change compiled shapes, defeating the single-compile design
(same rule as the socket daemon). A form `model` field is accepted and
ignored (OpenAI clients always send one); a `language` field is honored
per request when the server has no pinned language (streams group by
language per round anyway) and is a 400 when it contradicts a pinned one.
Uploads buffer in RAM while being parsed; WHISPER_TPU_HTTP_MAX_UPLOADS
(default 4) bounds how many buffer concurrently.

Threading model: HTTP handler threads only parse uploads and enqueue;
everything that touches JAX runs on the single serve_forever() thread.

Usage:
    python -m whisper_tpu.http_server --port 8000 --model turbo --slots 4
    curl -s localhost:8000/v1/audio/transcriptions -F file=@clip.flac
"""

import json
import os
import queue
import tempfile
import threading
import time
import urllib.parse
from email.parser import BytesParser
from email.policy import HTTP
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .continuous import ContinuousBatcher
from .streaming import StreamingTranscriber

MAX_UPLOAD_BYTES = 512 << 20  # ~8.7 h of 16 kHz s16 mono
MAX_STREAM_PENDING_S = 600.0  # undecoded backlog cap per live session

# per-session knobs a streaming request may set via query params
_STREAM_SESSION_KEYS = ("language", "partial_hop_s", "word_timestamps", "task")


def _json_line(obj: dict) -> bytes:
    # segments may carry numpy scalars (seek/start/end); item() unwraps
    return (
        json.dumps(obj, default=lambda o: o.item() if hasattr(o, "item") else str(o))
        + "\n"
    ).encode()


class _HTTPStream:
    """One live streaming request: the handler thread reads/decodes PCM and
    parks until `done`; the serve thread owns the StreamingTranscriber and
    writes chunked response frames."""

    __slots__ = (
        "wfile",
        "opts",
        "st",
        "fed_samples",
        "enqueued_samples",
        "dead",
        "done",
        "wlock",
    )

    def __init__(self, wfile, opts: dict):
        self.wfile = wfile
        self.opts = opts
        self.st = None
        self.fed_samples = 0  # serve thread: samples whose sfeed ran
        self.enqueued_samples = 0  # handler thread: samples put on the queue
        self.dead = False
        self.done = threading.Event()
        # serializes response writes between the serve thread (frames) and
        # the handler thread (terminal chunk on a timed-out session)
        self.wlock = threading.Lock()


class _Pending:
    """One in-flight request: the handler thread parks on `event` until the
    serve loop resolves `response` (status, payload dict-or-text)."""

    __slots__ = ("event", "response", "tmp_path", "response_format", "language")

    def __init__(self, tmp_path: str, response_format: str, language=None):
        self.event = threading.Event()
        self.response = None
        self.tmp_path = tmp_path
        self.response_format = response_format
        self.language = language


def _parse_multipart(content_type: str, body: bytes):
    """-> {field_name: bytes_or_str_value, ...} plus the file part's bytes.

    Parsed with the stdlib email machinery: the request body IS a MIME
    multipart document once re-headed with its Content-Type."""
    head = f"Content-Type: {content_type}\r\nMIME-Version: 1.0\r\n\r\n".encode()
    msg = BytesParser(policy=HTTP).parsebytes(head + body)
    if not msg.is_multipart():
        raise ValueError("expected multipart/form-data")
    fields = {}
    file_bytes = None
    file_name = None
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        payload = part.get_payload(decode=True)
        if name == "file":
            file_bytes = payload
            file_name = part.get_filename() or "upload"
        else:
            fields[name] = payload.decode("utf-8", "replace").strip()
    return fields, file_bytes, file_name


def _format_response(result: dict, response_format: str):
    """-> (content_type, body_bytes) in the OpenAI response schema."""
    if response_format == "text":
        return "text/plain; charset=utf-8", (result["text"].strip() + "\n").encode()
    if response_format == "verbose_json":
        segs = result.get("segments", [])
        # the batcher records the true audio duration; fall back to the last
        # segment's end only for result dicts that predate the field
        duration = result.get(
            "duration", round(float(segs[-1]["end"]), 3) if segs else 0.0
        )
        body = {
            "task": "transcribe",
            "language": result.get("language"),
            "duration": float(duration),
            "text": result["text"],
            "segments": segs,
        }
        return "application/json", json.dumps(body).encode()
    return "application/json", json.dumps({"text": result["text"]}).encode()


class TranscriptionHTTPServer:
    def __init__(
        self,
        model,
        host: str = "127.0.0.1",
        port: int = 8000,
        slots: int = 4,
        **batcher_options,
    ):
        self.model = model
        self.slots = slots
        self.language = batcher_options.get("language")
        self._batcher_options = dict(batcher_options)
        self.batcher = ContinuousBatcher(model, slots=slots, **batcher_options)
        self._make_batcher = lambda: ContinuousBatcher(
            model, slots=slots, **batcher_options
        )
        self._requests: "queue.Queue[_Pending]" = queue.Queue()
        self._pending_for_ticket = {}
        self._stop = threading.Event()
        # handler threads enqueue under this lock while the flag is open;
        # shutdown flips it under the same lock BEFORE draining, so no
        # _Pending can land after the one-shot drain (it would park its
        # handler thread on event.wait() forever)
        self._queue_open = True
        self._queue_lock = threading.Lock()
        # HTTP-level counters; batcher-level ones live in batcher.stats.
        # Bumped from concurrent handler threads -> lock (dict += is not
        # atomic across its read-modify-write bytecodes).
        self.http_stats = {"http_requests_total": 0, "http_errors_total": 0}
        self._stats_lock = threading.Lock()
        # bound concurrent upload buffering: each in-flight multipart parse
        # holds ~2-3x the body in RAM, and ThreadingHTTPServer spawns one
        # thread per connection with no limit of its own
        max_uploads = os.environ.get("WHISPER_TPU_HTTP_MAX_UPLOADS", "4")
        try:
            max_uploads = int(max_uploads)
        except ValueError:
            raise ValueError(
                f"WHISPER_TPU_HTTP_MAX_UPLOADS={max_uploads!r} is not an int"
            )
        if max_uploads < 1:
            # 0 would deadlock every POST on the semaphore; negatives crash
            raise ValueError(
                f"WHISPER_TPU_HTTP_MAX_UPLOADS must be >= 1, got {max_uploads}"
            )
        self._upload_sem = threading.BoundedSemaphore(max_uploads)

        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet; errors surface in responses
                pass

            def _send(self, status: int, content_type: str, body: bytes):
                self.send_response(status)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                if self.close_connection:
                    self.send_header("Connection", "close")
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, status: int, obj: dict):
                self._send(status, "application/json", json.dumps(obj).encode())

            def _send_error_openai(self, status: int, message: str):
                server._bump("http_errors_total")
                self._send_json(status, {"error": {"message": message}})

            def _fail_before_body_read(self, status: int, message: str):
                """Error out WITHOUT having consumed the request body. On a
                keep-alive (HTTP/1.1) connection the unread bytes would be
                parsed as the next request line, desynchronizing every
                pooled request after this one — close the connection
                instead of draining up to MAX_UPLOAD_BYTES."""
                self.close_connection = True
                self._send_error_openai(status, message)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send_json(
                        200,
                        {"ok": True, "model": server.model.name, "slots": server.slots},
                    )
                elif self.path == "/metrics":
                    self._send(
                        200,
                        "text/plain; version=0.0.4; charset=utf-8",
                        server._render_metrics().encode(),
                    )
                else:
                    self._send_error_openai(404, f"no route {self.path}")

            def _read_pcm_pieces(self):
                """Yield raw body pieces: chunked transfer-encoding frames,
                or Content-Length read in slices. Raises on oversize."""
                total = 0
                if self.headers.get("Transfer-Encoding", "").lower() == "chunked":
                    while True:
                        size_line = self.rfile.readline(34)
                        size = int(size_line.split(b";")[0].strip() or b"0", 16)
                        if size < 0:
                            # int(b"-10", 16) parses; a negative size would
                            # roll back `total` past the cap and turn the
                            # read() below into read-to-EOF
                            raise ValueError("negative chunk size")
                        if size == 0:
                            self.rfile.readline()  # trailing CRLF
                            return
                        total += size
                        if total > MAX_UPLOAD_BYTES:
                            raise ValueError("stream exceeds 512 MiB")
                        data = self.rfile.read(size)
                        if len(data) < size:
                            raise ValueError("connection closed mid-chunk")
                        self.rfile.readline()  # chunk CRLF
                        yield data
                else:
                    length = int(self.headers.get("Content-Length", "0") or 0)
                    if length <= 0:
                        raise ValueError("empty body (need Content-Length or chunked)")
                    if length > MAX_UPLOAD_BYTES:
                        raise ValueError("stream exceeds 512 MiB")
                    while length > 0:
                        piece = self.rfile.read(min(65536, length))
                        if not piece:
                            # short read = the client died mid-upload; a
                            # silent return here would transcribe truncated
                            # audio and reply done:true as if it were whole
                            raise ValueError(
                                f"connection closed {length} bytes short of "
                                "Content-Length"
                            )
                        length -= len(piece)
                        yield piece

            def do_stream(self, query: str):
                """POST /v1/audio/transcriptions/stream — live PCM in,
                ndjson segments out. IO stays here; decoding runs on the
                serve thread (see _stream_event)."""
                params = {
                    k: v[0] for k, v in urllib.parse.parse_qs(query).items()
                }
                encoding = params.pop("encoding", "f32")
                if encoding not in ("f32", "s16"):
                    self._fail_before_body_read(
                        400, f"encoding must be f32 or s16, got {encoding!r}"
                    )
                    return
                opts = {}
                try:
                    for k in _STREAM_SESSION_KEYS:
                        if k in params:
                            v = params[k]
                            if k == "partial_hop_s":
                                v = float(v)
                            elif k == "word_timestamps":
                                v = v.lower() in ("1", "true", "yes")
                            opts[k] = v
                except ValueError as e:
                    self._fail_before_body_read(400, str(e))
                    return

                self.close_connection = True  # manual chunked framing below
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.send_header("Connection", "close")
                self.end_headers()

                sess = _HTTPStream(self.wfile, opts)
                if not server._enqueue(("sopen", sess, None)):
                    server._chunk_write(sess, {"error": "server shutting down"})
                    self.wfile.write(b"0\r\n\r\n")
                    return
                itemsize = 4 if encoding == "f32" else 2
                buf = b""
                try:
                    for piece in self._read_pcm_pieces():
                        buf += piece
                        usable = len(buf) - (len(buf) % itemsize)
                        if usable == 0:
                            continue
                        raw, buf = buf[:usable], buf[usable:]
                        if encoding == "f32":
                            audio = np.frombuffer(raw, dtype="<f4").astype(
                                np.float32
                            )
                        else:
                            audio = (
                                np.frombuffer(raw, dtype="<i2").astype(np.float32)
                                / 32768.0
                            )
                        # backpressure: stop reading the socket while the
                        # serve thread is behind by more than the cap, so
                        # the queue holds a bounded amount of audio and the
                        # client sees TCP pushback instead of an OOM'd server
                        waited_s = 0.0
                        while (
                            not sess.done.is_set()
                            and (sess.enqueued_samples - sess.fed_samples)
                            / 16000.0
                            > MAX_STREAM_PENDING_S
                        ):
                            if waited_s > 600.0:  # wedged serve thread
                                raise RuntimeError(
                                    "server backlogged beyond the stream cap"
                                )
                            time.sleep(0.05)
                            waited_s += 0.05
                        if sess.done.is_set():
                            break  # session failed server-side; stop reading
                        sess.enqueued_samples += len(audio)
                        server._enqueue(("sfeed", sess, audio))
                    server._enqueue(("send", sess, None))
                except Exception as e:
                    server._enqueue(("sfail", sess, f"{type(e).__name__}: {e}"))
                # wait for the serve thread to finish the session; keep
                # waiting while it is making progress (long uploads decode
                # interleaved with batch rounds), give up only after a
                # 10-minute slice with no event processed
                last_fed = -1
                while not sess.done.wait(timeout=600):
                    if sess.fed_samples == last_fed:
                        server._bump("http_errors_total")
                        break
                    last_fed = sess.fed_samples
                # once `done` is set the serve thread writes no more; on the
                # no-progress bailout, killing the session under wlock keeps
                # the terminal chunk from interleaving with a frame write
                with sess.wlock:
                    sess.dead = True
                    try:
                        self.wfile.write(b"0\r\n\r\n")
                    except OSError:
                        pass

            def do_POST(self):
                server._bump("http_requests_total")
                # self.path carries any query string — match on the path part
                # (gateways append api-version/tracing params to valid URLs)
                path, _, query = self.path.partition("?")
                path = path.rstrip("/")
                if path == "/v1/audio/transcriptions/stream":
                    self.do_stream(query)
                    return
                if path != "/v1/audio/transcriptions":
                    self._fail_before_body_read(404, f"no route {self.path}")
                    return
                length = int(self.headers.get("Content-Length", "0") or 0)
                if length <= 0:
                    self._fail_before_body_read(400, "empty body")
                    return
                if length > MAX_UPLOAD_BYTES:
                    self._fail_before_body_read(400, "upload exceeds 512 MiB")
                    return
                ctype = self.headers.get("Content-Type", "")
                if "multipart/form-data" not in ctype:
                    self._fail_before_body_read(
                        400, "expected multipart/form-data with a 'file' field"
                    )
                    return
                with server._upload_sem:
                    body = self.rfile.read(length)
                    try:
                        fields, file_bytes, file_name = _parse_multipart(
                            ctype, body
                        )
                        del body
                        if not file_bytes:
                            raise ValueError("missing 'file' field")
                        # language validation (alias normalization, pin
                        # match) belongs to batcher.submit — its ValueError
                        # comes back as a 400 from the worker thread. A raw
                        # string compare here would 400 'English'/'EN'
                        # against a pinned 'en' that submit() accepts.
                        lang = fields.get("language") or None
                        response_format = fields.get("response_format", "json")
                        if response_format not in ("json", "text", "verbose_json"):
                            raise ValueError(
                                f"unsupported response_format {response_format!r}"
                            )
                    except Exception as e:
                        self._send_error_openai(400, str(e))
                        return

                    # decoding happens via the audio frontend, which sniffs
                    # the container (WAV/FLAC native, anything else via
                    # ffmpeg) — it needs a path, so the upload lands in a
                    # temp file
                    suffix = os.path.splitext(file_name)[1] or ".bin"
                    fd, tmp_path = tempfile.mkstemp(
                        prefix="wtpu_http_", suffix=suffix
                    )
                    with os.fdopen(fd, "wb") as f:
                        f.write(file_bytes)
                pending = _Pending(tmp_path, response_format, language=lang)
                with server._queue_lock:
                    enqueued = server._queue_open
                    if enqueued:
                        server._requests.put(pending)
                if not enqueued:  # shutdown drain already ran — answer here
                    try:
                        os.unlink(tmp_path)
                    except OSError:
                        pass
                    self._send_error_openai(503, "server shutting down")
                    return
                pending.event.wait()

                status, payload = pending.response
                if status != 200:
                    self._send_error_openai(status, payload)
                    return
                ctype_out, body = _format_response(payload, response_format)
                self._send(200, ctype_out, body)

        self._handler_cls = Handler
        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self.host, self.port = self._httpd.server_address[:2]

    # ---------------------------------------------------------------- serve

    def _render_metrics(self) -> str:
        """Prometheus text exposition: HTTP counters + batcher round/request
        counters + current occupancy. Counters are monotonic; gauges
        reflect this instant."""
        b = self.batcher
        lines = []

        def metric(name, kind, help_, value):
            lines.append(f"# HELP {name} {help_}")
            lines.append(f"# TYPE {name} {kind}")
            lines.append(f"{name} {value}")

        metric("wtpu_http_requests_total", "counter",
               "POST requests received", self.http_stats["http_requests_total"])
        metric("wtpu_http_errors_total", "counter",
               "error responses sent", self.http_stats["http_errors_total"])
        metric("wtpu_requests_submitted_total", "counter",
               "requests admitted to the batcher", int(b.stats["requests_submitted"]))
        metric("wtpu_requests_completed_total", "counter",
               "requests fully transcribed", int(b.stats["requests_completed"]))
        metric("wtpu_decode_rounds_total", "counter",
               "lockstep window rounds run", int(b.stats["rounds"]))
        metric("wtpu_decode_round_seconds_total", "counter",
               "wall seconds inside decode rounds",
               round(b.stats["round_seconds_sum"], 6))
        metric("wtpu_windows_decoded_total", "counter",
               "30s windows decoded (occupied slots x rounds)",
               int(b.stats["windows_decoded"]))
        metric("wtpu_slots", "gauge", "configured batcher slots", self.slots)
        metric("wtpu_requests_in_flight", "gauge",
               "requests admitted but not finished", b.pending())
        return "\n".join(lines) + "\n"

    def _bump(self, name: str):
        with self._stats_lock:
            self.http_stats[name] += 1

    def _resolve(self, pending: _Pending, status: int, payload):
        try:
            os.unlink(pending.tmp_path)
        except OSError:
            pass
        pending.response = (status, payload)
        pending.event.set()

    # ------------------------------------------------------------ streaming

    def _enqueue(self, item) -> bool:
        with self._queue_lock:
            if self._queue_open:
                self._requests.put(item)
                return True
        return False

    def _chunk_write(self, sess: _HTTPStream, obj: dict) -> None:
        with sess.wlock:
            if sess.dead:
                return
            raw = _json_line(obj)
            try:
                sess.wfile.write(f"{len(raw):x}\r\n".encode() + raw + b"\r\n")
                sess.wfile.flush()
            except OSError:
                sess.dead = True

    def _stream_event(self, kind: str, sess: _HTTPStream, payload) -> None:
        """Serve-thread half of a live HTTP session: every feed()/flush()
        (and therefore every JAX decode) happens here; response frames are
        written here too (the handler thread is parked on sess.done)."""
        if kind == "sopen":
            opts = dict(self._batcher_options)
            opts.pop("language", None)  # sessions pin/detect independently
            opts.pop("slots", None)
            opts.update(sess.opts)
            try:
                sess.st = StreamingTranscriber(self.model, **opts)
            except Exception as e:
                self._chunk_write(sess, {"error": f"{type(e).__name__}: {e}"})
                sess.done.set()
            return
        if sess.done.is_set() or sess.st is None:
            return
        if kind == "sfeed":
            # backlog control lives on the HANDLER thread (do_stream stops
            # reading the socket while enqueued-but-unprocessed audio exceeds
            # MAX_STREAM_PENDING_S, so the queue stays bounded and TCP
            # backpressure reaches the client); feed() below decodes every
            # complete window synchronously, so decode lag never exceeds one
            # window here
            sess.fed_samples += len(payload)
            try:
                for seg in sess.st.feed(payload):
                    self._chunk_write(sess, {"segment": seg})
            except Exception as e:
                self._chunk_write(sess, {"error": f"{type(e).__name__}: {e}"})
                sess.done.set()
        elif kind == "send":
            try:
                for seg in sess.st.flush():
                    self._chunk_write(sess, {"segment": seg})
                res = sess.st.result
                self._chunk_write(
                    sess,
                    {
                        "done": True,
                        "text": res["text"],
                        "language": res["language"],
                        "duration": sess.fed_samples / 16000.0,
                    },
                )
            except Exception as e:
                self._chunk_write(sess, {"error": f"{type(e).__name__}: {e}"})
            sess.done.set()
        elif kind == "sfail":
            self._chunk_write(sess, {"error": payload})
            sess.done.set()

    def _admit(self, block: bool):
        try:
            pending = self._requests.get(timeout=0.05) if block else (
                self._requests.get_nowait()
            )
        except queue.Empty:
            return
        if isinstance(pending, tuple):
            self._stream_event(*pending)
            return
        try:
            ticket = self.batcher.submit(
                pending.tmp_path, language=pending.language
            )
        except ValueError as e:  # undecodable upload / bad language
            self._resolve(pending, 400, str(e))
            return
        except Exception as e:  # device/runtime fault is NOT the client's
            self._resolve(pending, 500, f"{type(e).__name__}: {e}")
            return
        if self.batcher.ready(ticket):  # sub-second audio resolves at submit
            self._resolve(pending, 200, self.batcher.pop(ticket))
        else:
            self._pending_for_ticket[ticket] = pending

    def serve_forever(self):
        """Accept connections and run lockstep decode rounds until
        shutdown(). HTTP IO runs on handler threads; this thread owns JAX."""
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        while not self._stop.is_set():
            self._admit(block=not self._pending_for_ticket)
            while not self._requests.empty():
                self._admit(block=False)
            if self._pending_for_ticket:
                try:
                    self.batcher.step()
                except Exception as e:  # a failed round must not hang clients
                    msg = f"decode round failed: {type(e).__name__}: {e}"
                    for p in self._pending_for_ticket.values():
                        self._resolve(p, 500, msg)
                    self._pending_for_ticket.clear()
                    # carry the counters over — /metrics documents them as
                    # monotonic, and a mid-process reset breaks rate()
                    stats = self.batcher.stats
                    self.batcher = self._make_batcher()
                    self.batcher.stats = stats
                    continue
                for t in [
                    t for t in self._pending_for_ticket if self.batcher.ready(t)
                ]:
                    self._resolve(
                        self._pending_for_ticket.pop(t), 200, self.batcher.pop(t)
                    )
        self._httpd.shutdown()
        # close the queue BEFORE draining: in-flight do_POST threads now
        # answer 503 themselves instead of enqueueing after the drain (which
        # would park them on event.wait() forever)
        with self._queue_lock:
            self._queue_open = False
        # resolve everything still in flight — handler threads wait on their
        # pending.event with no timeout, so abandoning them here would hang
        # every connected client until TCP timeout
        while True:
            try:
                p = self._requests.get_nowait()
            except queue.Empty:
                break
            if isinstance(p, tuple):  # live-session event: close the session
                _, sess, _ = p
                if not sess.done.is_set():
                    self._chunk_write(sess, {"error": "server shutting down"})
                    sess.done.set()
                continue
            self._resolve(p, 503, "server shutting down")
        for p in self._pending_for_ticket.values():
            self._resolve(p, 503, "server shutting down")
        self._pending_for_ticket.clear()

    def shutdown(self):
        self._stop.set()


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="OpenAI-compatible HTTP transcription server"
    )
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model", default="turbo")
    parser.add_argument("--slots", type=int, default=4)
    parser.add_argument("--language", default=None)
    parser.add_argument("--beam_size", type=int, default=None)
    parser.add_argument("--temperature", type=float, default=None)
    parser.add_argument(
        "--word_timestamps",
        action="store_true",
        help="segments carry per-word times (shown in verbose_json)",
    )
    args = parser.parse_args(argv)

    from . import load_model

    model = load_model(args.model)
    kw = {}
    if args.beam_size is not None:
        kw["beam_size"] = args.beam_size
    if args.temperature is not None:
        kw["temperature"] = args.temperature
    srv = TranscriptionHTTPServer(
        model, args.host, args.port, slots=args.slots, language=args.language,
        word_timestamps=args.word_timestamps, **kw
    )
    print(f"serving on http://{srv.host}:{srv.port} (slots={args.slots})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
