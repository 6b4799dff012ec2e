"""OpenAI-compatible HTTP endpoint: multipart uploads through the continuous
batcher must return the transcript sequential transcribe() produces, in each
response_format; malformed requests get OpenAI-schema errors."""

import json
import threading
import urllib.request
import uuid

import pytest


def _multipart(fields: dict, file_bytes: bytes, filename: str):
    boundary = uuid.uuid4().hex
    parts = []
    for k, v in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
            f"\r\n\r\n{v}\r\n".encode()
        )
    parts.append(
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="{filename}"\r\nContent-Type: application/octet-stream'
        f"\r\n\r\n".encode()
        + file_bytes
        + b"\r\n"
    )
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


def _post(url: str, body: bytes, content_type: str, timeout=300.0):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type", ""), e.read()


@pytest.fixture(scope="module")
def http_server(tpu_model):
    from whisper_tpu.http_server import TranscriptionHTTPServer

    srv = TranscriptionHTTPServer(
        tpu_model, "127.0.0.1", 0, slots=2, language="en", temperature=0.0
    )
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://{srv.host}:{srv.port}", srv
    srv.shutdown()
    th.join(timeout=10)


def test_healthz(http_server):
    url, _ = http_server
    with urllib.request.urlopen(f"{url}/healthz", timeout=10) as r:
        body = json.loads(r.read())
    assert body["ok"] is True and body["slots"] == 2


def test_transcription_json_matches_transcribe(http_server, tpu_model, jfk_flac_path):
    url, _ = http_server
    with open(jfk_flac_path, "rb") as f:
        data = f.read()
    body, ctype = _multipart({"model": "whisper-1"}, data, "jfk.flac")
    status, rtype, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 200 and rtype.startswith("application/json"), resp
    out = json.loads(resp)
    ref = tpu_model.transcribe(
        jfk_flac_path, language="en", temperature=0.0, verbose=None
    )
    assert out == {"text": ref["text"]}


def test_response_formats(http_server, tpu_model, jfk_flac_path, jfk_audio):
    url, _ = http_server
    with open(jfk_flac_path, "rb") as f:
        data = f.read()
    ref = tpu_model.transcribe(
        jfk_flac_path, language="en", temperature=0.0, verbose=None
    )

    body, ctype = _multipart({"response_format": "text"}, data, "jfk.flac")
    status, rtype, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 200 and rtype.startswith("text/plain")
    assert resp.decode().strip() == ref["text"].strip()

    body, ctype = _multipart({"response_format": "verbose_json"}, data, "jfk.flac")
    status, rtype, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 200
    out = json.loads(resp)
    assert out["task"] == "transcribe" and out["language"] == "en"
    assert out["text"] == ref["text"]
    assert len(out["segments"]) == len(ref["segments"])
    # duration is the uploaded audio's true length (OpenAI schema), NOT the
    # last segment's end (speech may stop early / be gated as silence)
    assert out["duration"] == pytest.approx(len(jfk_audio) / 16000, abs=0.05)


def test_concurrent_uploads_share_slots(http_server, tpu_model, jfk_flac_path):
    url, _ = http_server
    with open(jfk_flac_path, "rb") as f:
        data = f.read()
    ref = tpu_model.transcribe(
        jfk_flac_path, language="en", temperature=0.0, verbose=None
    )
    out = [None] * 3

    def client(i):
        body, ctype = _multipart({}, data, "jfk.flac")
        out[i] = _post(f"{url}/v1/audio/transcriptions", body, ctype)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for status, _, resp in out:
        assert status == 200
        assert json.loads(resp)["text"] == ref["text"]


def test_http_errors(http_server):
    url, srv = http_server

    # missing file field
    body, ctype = _multipart({"model": "whisper-1"}, b"", "x")
    status, _, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 400 and "file" in json.loads(resp)["error"]["message"]

    # non-multipart body
    status, _, resp = _post(
        f"{url}/v1/audio/transcriptions", b'{"x": 1}', "application/json"
    )
    assert status == 400

    # language contradicting the pinned server language
    body, ctype = _multipart({"language": "fr"}, b"RIFFxxxx", "a.wav")
    status, _, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 400 and "pinned" in json.loads(resp)["error"]["message"]

    # undecodable audio bytes -> 400 from submit, not a hang
    body, ctype = _multipart({}, b"not audio at all", "a.wav")
    status, _, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 400

    # unknown routes
    status, _, _ = _post(f"{url}/v1/other", b"", "text/plain")
    assert status == 404
    req = urllib.request.Request(f"{url}/nope")
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404

    # per-request state must not accumulate
    assert srv._pending_for_ticket == {}
    assert srv.batcher._streams == {} or srv.batcher.pending() == 0


def test_keepalive_discipline(http_server, jfk_flac_path):
    """Errors raised before the request body is read must CLOSE the
    connection (unread body bytes would be parsed as the next request line,
    desynchronizing every pooled request after); errors raised after the
    body is read keep the connection usable."""
    import http.client

    url, _ = http_server
    host, port = url[len("http://"):].rsplit(":", 1)

    # (a) non-multipart body -> 400 without reading the body -> close
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    conn.request(
        "POST",
        "/v1/audio/transcriptions",
        b'{"x": 1}',
        {"Content-Type": "application/json"},
    )
    r = conn.getresponse()
    assert r.status == 400
    assert (r.getheader("Connection") or "").lower() == "close"
    r.read()
    conn.close()

    # (b) missing-file 400 (body fully read) then a valid request — with a
    # query string on the URL — ride the SAME socket without desync
    conn = http.client.HTTPConnection(host, int(port), timeout=120)
    body, ctype = _multipart({"model": "whisper-1"}, b"", "x")
    conn.request(
        "POST", "/v1/audio/transcriptions", body, {"Content-Type": ctype}
    )
    r = conn.getresponse()
    assert r.status == 400
    assert "file" in json.loads(r.read())["error"]["message"]
    with open(jfk_flac_path, "rb") as f:
        data = f.read()
    body, ctype = _multipart({}, data, "jfk.flac")
    conn.request(
        "POST",
        "/v1/audio/transcriptions?api-version=2026-08",
        body,
        {"Content-Type": ctype},
    )
    r = conn.getresponse()
    assert r.status == 200
    assert json.loads(r.read())["text"]
    conn.close()


def test_rejected_submits_do_not_count_as_admitted(http_server):
    """A 400-rejected upload must not bump wtpu_requests_submitted_total:
    submitted - completed is the natural backlog derivation and must not
    drift on malformed traffic."""
    url, srv = http_server
    before = int(srv.batcher.stats["requests_submitted"])
    body, ctype = _multipart({}, b"not audio at all", "a.wav")
    status, _, _ = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 400
    assert int(srv.batcher.stats["requests_submitted"]) == before


def test_word_timestamps_in_verbose_json(tpu_model, jfk_flac_path):
    """A server built with word_timestamps=True returns per-word times in
    verbose_json segments (OpenAI word-granularity analog)."""
    from whisper_tpu.http_server import TranscriptionHTTPServer

    srv = TranscriptionHTTPServer(
        tpu_model, "127.0.0.1", 0, slots=1, language="en",
        temperature=0.0, word_timestamps=True,
    )
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        url = f"http://{srv.host}:{srv.port}"
        with open(jfk_flac_path, "rb") as f:
            data = f.read()
        body, ctype = _multipart({"response_format": "verbose_json"}, data, "jfk.flac")
        status, _, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
        assert status == 200
        out = json.loads(resp)
        words = [w for s in out["segments"] for w in s.get("words", [])]
        assert words, "no words in verbose_json segments"
        for w in words:
            assert set(w) >= {"word", "start", "end"}
            assert 0.0 <= w["start"] <= w["end"]
    finally:
        srv.shutdown()
        th.join(timeout=10)


def test_metrics_endpoint(http_server, jfk_flac_path):
    """/metrics serves Prometheus text with consistent counters after a
    request round-trips."""
    url, srv = http_server
    with open(jfk_flac_path, "rb") as f:
        data = f.read()
    body, ctype = _multipart({}, data, "jfk.flac")
    status, _, _ = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 200

    with urllib.request.urlopen(f"{url}/metrics", timeout=10) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    vals = {
        line.split()[0]: float(line.split()[1])
        for line in text.splitlines()
        if line and not line.startswith("#")
    }
    assert vals["wtpu_http_requests_total"] >= 1
    assert vals["wtpu_requests_completed_total"] >= 1
    assert (
        vals["wtpu_requests_submitted_total"] >= vals["wtpu_requests_completed_total"]
    )
    assert vals["wtpu_decode_rounds_total"] >= 1
    assert vals["wtpu_decode_round_seconds_total"] > 0
    assert vals["wtpu_windows_decoded_total"] >= vals["wtpu_decode_rounds_total"]
    assert vals["wtpu_slots"] == 2
    assert vals["wtpu_requests_in_flight"] == 0


def test_shutdown_resolves_inflight_requests(tpu_model):
    """shutdown() must not strand handler threads: queued requests resolve
    with 503 instead of waiting forever on their event."""
    from whisper_tpu.http_server import TranscriptionHTTPServer, _Pending

    srv = TranscriptionHTTPServer(tpu_model, "127.0.0.1", 0, slots=1, language="en")
    p = _Pending("/nonexistent", "json")
    srv._requests.put(p)
    srv.shutdown()
    srv.serve_forever()  # exits immediately; must resolve the queued request
    assert p.event.is_set()
    assert p.response[0] == 503


# runs LAST in this module on purpose: it injects a failing decode round,
# which makes the server swap in a replacement batcher
def test_failed_round_answers_clients_and_keeps_counters(
    http_server, jfk_flac_path
):
    url, srv = http_server
    rounds_before = int(srv.batcher.stats["rounds"])
    assert rounds_before > 0  # earlier tests decoded through this batcher

    def boom():
        raise RuntimeError("injected decode failure")

    srv.batcher.step = boom
    with open(jfk_flac_path, "rb") as f:
        data = f.read()
    body, ctype = _multipart({}, data, "jfk.flac")
    status, _, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 500
    assert "injected decode failure" in json.loads(resp)["error"]["message"]
    assert srv._pending_for_ticket == {}

    # the replacement batcher carries the monotonic counters over
    assert int(srv.batcher.stats["rounds"]) >= rounds_before

    # ... and serves correctly
    status, _, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
    assert status == 200
    assert json.loads(resp)["text"]


def test_language_aliases_accepted_against_pin(http_server, jfk_flac_path):
    """'English'/'EN' must NOT 400 against a server pinned to 'en' — the
    batcher normalizes aliases; the HTTP layer must not raw-string-compare
    them (the socket daemon already accepted these)."""
    url, _ = http_server
    with open(jfk_flac_path, "rb") as f:
        data = f.read()
    for alias in ("English", "EN", "en"):
        body, ctype = _multipart({"language": alias}, data, "jfk.flac")
        status, _, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype)
        assert status == 200, (alias, resp)
        assert json.loads(resp)["text"]


def test_max_uploads_env_validated(tpu_model, monkeypatch):
    """WHISPER_TPU_HTTP_MAX_UPLOADS=0 would deadlock every POST on the
    BoundedSemaphore; it and garbage values must fail loudly at startup."""
    from whisper_tpu.http_server import TranscriptionHTTPServer

    for bad in ("0", "-3", "four"):
        monkeypatch.setenv("WHISPER_TPU_HTTP_MAX_UPLOADS", bad)
        with pytest.raises(ValueError, match="WHISPER_TPU_HTTP_MAX_UPLOADS"):
            TranscriptionHTTPServer(tpu_model, "127.0.0.1", 0, slots=1, language="en")

    monkeypatch.setenv("WHISPER_TPU_HTTP_MAX_UPLOADS", "2")
    srv = TranscriptionHTTPServer(tpu_model, "127.0.0.1", 0, slots=1, language="en")
    srv._httpd.server_close()


def test_post_after_drain_answers_503(tpu_model, jfk_flac_path):
    """A do_POST that reaches the enqueue point after the shutdown drain must
    answer 503 itself, not park forever on event.wait() (the drain is
    one-shot). Simulates the race window by closing the queue flag while the
    HTTP listener is still up."""
    from whisper_tpu.http_server import TranscriptionHTTPServer

    srv = TranscriptionHTTPServer(tpu_model, "127.0.0.1", 0, slots=1, language="en")
    th = threading.Thread(target=srv._httpd.serve_forever, daemon=True)
    th.start()
    try:
        with srv._queue_lock:
            srv._queue_open = False
        with open(jfk_flac_path, "rb") as f:
            data = f.read()
        body, ctype = _multipart({}, data, "jfk.flac")
        url = f"http://{srv.host}:{srv.port}"
        status, _, resp = _post(f"{url}/v1/audio/transcriptions", body, ctype, timeout=30)
        assert status == 503
        assert "shutting down" in json.loads(resp)["error"]["message"]
        assert srv._requests.empty()  # nothing parked for a drain that already ran
    finally:
        srv._httpd.shutdown()
        th.join(timeout=10)


# ---------------------------------------------------------------- streaming


def _stream_pcm(url: str, audio, *, query="", chunk_s=2.0, encoding="f32",
                timeout=300.0):
    """POST raw PCM with chunked transfer-encoding via http.client; returns
    the list of ndjson messages."""
    import http.client
    import numpy as np
    import urllib.parse as up

    u = up.urlparse(url)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=timeout)

    def chunks():
        step = int(chunk_s * 16000)
        for i in range(0, len(audio), step):
            piece = audio[i : i + step]
            if encoding == "f32":
                yield piece.astype("<f4").tobytes()
            else:
                yield np.clip(piece * 32768.0, -32768, 32767).astype(
                    "<i2"
                ).tobytes()

    query = "&".join(p for p in (query, f"encoding={encoding}") if p)
    path = f"/v1/audio/transcriptions/stream?{query}"
    conn.request(
        "POST", path, body=chunks(),
        headers={"Transfer-Encoding": "chunked", "Content-Type": "audio/pcm"},
        encode_chunked=True,
    )
    resp = conn.getresponse()
    assert resp.status == 200, resp.read()
    msgs = []
    for line in resp.read().splitlines():
        if line.strip():
            msgs.append(json.loads(line))
    conn.close()
    return msgs


def test_http_streaming_partials_and_finals(http_server, tpu_model, jfk_audio):
    """Chunked PCM in, ndjson out: >=1 partial advisory precedes the first
    final segment; finals + text are bit-identical to batch transcribe()."""
    import numpy as np

    url, _ = http_server
    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])  # 33 s
    ref = tpu_model.transcribe(
        long_audio, language="en", temperature=0.0, verbose=None
    )
    msgs = _stream_pcm(url, long_audio, query="language=en&partial_hop_s=2.0")
    done = msgs[-1]
    assert done.get("done"), done
    segs = [m["segment"] for m in msgs[:-1] if "segment" in m]
    finals = [s for s in segs if not s.get("partial")]
    first_final_idx = next(
        i for i, s in enumerate(segs) if not s.get("partial")
    )
    assert any(s.get("partial") for s in segs[:first_final_idx]), (
        "no partial before the first final segment"
    )
    assert done["text"] == ref["text"]
    assert [s["tokens"] for s in finals] == [s["tokens"] for s in ref["segments"]]


def test_http_streaming_s16_and_autodetect(http_server, tpu_model, jfk_audio):
    """s16 encoding decodes as pcm/32768; language omitted auto-detects on
    the first finalized window, same as batch transcribe(language=None)."""
    import numpy as np

    url, _ = http_server
    quantized = (
        np.clip(jfk_audio * 32768.0, -32768, 32767).astype(np.int16)
        .astype(np.float32) / 32768.0
    )
    long_audio = np.concatenate([quantized, quantized, quantized])
    ref = tpu_model.transcribe(long_audio, temperature=0.0, verbose=None)
    msgs = _stream_pcm(url, long_audio, encoding="s16", chunk_s=4.0)
    done = msgs[-1]
    assert done.get("done"), done
    assert done["language"] == ref["language"]
    assert done["text"] == ref["text"]
    assert done["duration"] == pytest.approx(33.0, abs=0.1)


def test_http_streaming_bad_encoding(http_server):
    url, _ = http_server
    status, _, resp = _post(
        f"{url}/v1/audio/transcriptions/stream?encoding=mp3", b"x", "audio/pcm"
    )
    assert status == 400 and b"encoding" in resp


def _raw_stream_request(url: str, headers: str, payload: bytes) -> bytes:
    """Open a raw TCP socket, send a hand-built /stream POST, half-close,
    and return everything the server sends back."""
    import socket as socket_mod
    import urllib.parse as up

    u = up.urlparse(url)
    s = socket_mod.create_connection((u.hostname, u.port), timeout=60)
    s.sendall(
        (
            "POST /v1/audio/transcriptions/stream?encoding=s16&language=en "
            "HTTP/1.1\r\n"
            f"Host: {u.hostname}\r\n{headers}\r\n\r\n"
        ).encode()
        + payload
    )
    s.shutdown(socket_mod.SHUT_WR)
    out = b""
    try:
        while True:
            d = s.recv(65536)
            if not d:
                break
            out += d
    except OSError:
        pass
    s.close()
    return out


def test_http_streaming_negative_chunk_rejected(http_server):
    """A negative chunked-encoding size parses as hex but must be refused:
    it would bypass the upload cap and turn the body read into read-to-EOF."""
    url, _ = http_server
    out = _raw_stream_request(
        url, "Transfer-Encoding: chunked", b"-1\r\nXXXX\r\n0\r\n\r\n"
    )
    assert b'"error"' in out and b"negative chunk size" in out
    assert out.rstrip().endswith(b"0\r\n\r\n".rstrip())  # terminal chunk


def test_http_streaming_short_body_is_an_error(http_server):
    """Dying mid-upload (fewer bytes than Content-Length) must produce an
    error frame, not a done:true transcript of silently truncated audio."""
    url, _ = http_server
    out = _raw_stream_request(
        url, "Content-Length: 64000", b"\x00" * 1000
    )
    assert b'"error"' in out and b"short of" in out
    assert b'"done": true' not in out
