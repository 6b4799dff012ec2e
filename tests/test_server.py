"""The JSON-lines socket server: concurrent clients share the continuous
batcher and each receives the transcript sequential transcribe() produces."""

import json
import socket
import threading

import numpy as np
import pytest


def _request(sock_path: str, payload: dict, timeout=120.0) -> dict:
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.settimeout(timeout)
    c.connect(sock_path)
    c.sendall((json.dumps(payload) + "\n").encode())
    buf = b""
    while b"\n" not in buf:
        chunk = c.recv(65536)
        if not chunk:
            break
        buf += chunk
    c.close()
    return json.loads(buf.decode())


@pytest.fixture()
def server(tpu_model, tmp_path):
    from whisper_tpu.server import TranscriptionServer

    sock = str(tmp_path / "wtpu.sock")
    srv = TranscriptionServer(
        tpu_model, sock, slots=2, language="en", temperature=0.0
    )
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    # wait for the socket to bind
    import time

    for _ in range(100):
        try:
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.connect(sock)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    yield sock, srv
    srv.shutdown()
    th.join(timeout=10)


def test_server_concurrent_clients(server, tpu_model, jfk_flac_path, jfk_audio):
    sock, _ = server
    out = [None, None]

    def client(i):
        out[i] = _request(sock, {"audio": jfk_flac_path})

    threads = [threading.Thread(target=client, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    ref = tpu_model.transcribe(
        jfk_flac_path, language="en", temperature=0.0, verbose=None
    )
    for r in out:
        assert r is not None and "error" not in r, r
        assert r["text"] == ref["text"]
        assert r["language"] == "en"


def test_server_bad_requests(server):
    sock, _ = server
    assert "error" in _request(sock, {"no_audio": 1})
    assert "error" in _request(sock, {"audio": "/nonexistent/file.flac"})


def test_server_language_field(server, jfk_flac_path):
    """Per-request language: matching the pinned language (incl. full-name
    alias) is accepted; contradicting it is an error line, not a hang."""
    sock, _ = server
    ok = _request(sock, {"audio": jfk_flac_path, "language": "English"})
    assert "error" not in ok and ok["language"] == "en"
    assert ok["duration"] == pytest.approx(11.0, abs=0.05)
    bad = _request(sock, {"audio": jfk_flac_path, "language": "fr"})
    assert "error" in bad and "pinned" in bad["error"]


def test_server_five_clients_two_slots(server, tpu_model, jfk_flac_path):
    sock, _ = server
    n = 5
    out = [None] * n

    def client(i):
        out[i] = _request(sock, {"audio": jfk_flac_path})

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    ref = tpu_model.transcribe(
        jfk_flac_path, language="en", temperature=0.0, verbose=None
    )
    assert all(r is not None and "error" not in r for r in out), out
    assert {r["text"] for r in out} == {ref["text"]}


def test_server_soak_no_state_leak(server, jfk_flac_path):
    """A long-running daemon must not accumulate per-request state: after N
    requests drain, every batcher/server dict is empty (the leak class the
    r3 review pass found and fixed via pop() eviction)."""
    sock, srv = server
    N, waves = 12, 3
    results = []
    lock = threading.Lock()

    def client():
        r = _request(sock, {"audio": jfk_flac_path})
        with lock:
            results.append(r)

    for _ in range(waves):
        threads = [threading.Thread(target=client) for _ in range(N // waves)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)

    assert len(results) == N
    texts = {r.get("text") for r in results}
    assert all("error" not in r for r in results), results
    assert len(texts) == 1  # identical input -> identical transcript

    # wait for the serve loop to finish replying, then check state
    import time

    for _ in range(100):
        if not srv._conn_for_ticket and srv.batcher.pending() == 0:
            break
        time.sleep(0.05)
    b = srv.batcher
    assert srv._conn_for_ticket == {}
    assert b._streams == {} and b._langs == {} and b._results == {}
    assert not b._queue and all(t is None for t in b._slot_ticket)


# ---------------------------------------------------------------- streaming


def _open_stream(sock_path: str, opts: dict, timeout=300.0):
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.settimeout(timeout)
    c.connect(sock_path)
    c.sendall((json.dumps({"stream": True, **opts}) + "\n").encode())
    f = c.makefile("rb")
    ack = json.loads(f.readline())
    assert ack.get("ack"), ack
    return c, f


def _send_pcm(c: socket.socket, audio: np.ndarray, key="pcm"):
    import base64

    if key == "pcm":
        raw = audio.astype("<f4").tobytes()
    else:
        raw = np.clip(audio * 32768.0, -32768, 32767).astype("<i2").tobytes()
    c.sendall((json.dumps({key: base64.b64encode(raw).decode()}) + "\n").encode())


def _read_stream_lines(f):
    """Read lines until done/error; returns (lines, done_or_error)."""
    lines = []
    while True:
        line = f.readline()
        if not line:
            return lines, {"error": "connection closed"}
        msg = json.loads(line)
        if msg.get("done") or "error" in msg:
            return lines, msg
        lines.append(msg)


def test_server_streaming_partials_and_finals(server, tpu_model, jfk_audio):
    """A live streaming session over the real socket daemon: chunked PCM in,
    at least one partial advisory emitted BEFORE the first final segment,
    finals bit-identical to batch transcribe() on the concatenated audio."""
    sock, _ = server
    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])  # 33 s
    ref = tpu_model.transcribe(
        long_audio, language="en", temperature=0.0, verbose=None
    )

    c, f = _open_stream(sock, {"language": "en", "partial_hop_s": 2.0})
    step = 2 * 16000
    for i in range(0, len(long_audio), step):
        _send_pcm(c, long_audio[i : i + step])
    c.sendall(b'{"end": true}\n')
    lines, done = _read_stream_lines(f)
    c.close()

    assert done.get("done"), done
    segs = [m["segment"] for m in lines]
    partials = [s for s in segs if s.get("partial")]
    finals = [s for s in segs if not s.get("partial")]
    assert partials, "no partial advisories emitted"
    # emission order proves a partial arrived before the first window closed
    first_final_idx = next(i for i, s in enumerate(segs) if not s.get("partial"))
    assert any(s.get("partial") for s in segs[:first_final_idx]), (
        "no partial before the first final segment"
    )
    assert done["text"] == ref["text"]
    assert [s["tokens"] for s in finals] == [s["tokens"] for s in ref["segments"]]


def test_server_streaming_autodetect_language(server, tpu_model, jfk_audio):
    """A session without a language pin auto-detects on its first finalized
    window — same result as batch transcribe(language=None)."""
    sock, _ = server
    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])
    ref = tpu_model.transcribe(long_audio, temperature=0.0, verbose=None)

    c, f = _open_stream(sock, {})
    step = 4 * 16000
    for i in range(0, len(long_audio), step):
        _send_pcm(c, long_audio[i : i + step])
    c.sendall(b'{"end": true}\n')
    lines, done = _read_stream_lines(f)
    c.close()

    assert done.get("done"), done
    assert done["language"] == ref["language"]
    assert done["text"] == ref["text"]


def test_server_streaming_pcm16(server, tpu_model, jfk_audio):
    """pcm16 chunks decode as s16/32768 — same contract as the file path."""
    sock, _ = server
    quantized = (
        np.clip(jfk_audio * 32768.0, -32768, 32767).astype(np.int16).astype(np.float32)
        / 32768.0
    )
    ref = tpu_model.transcribe(
        quantized, language="en", temperature=0.0, verbose=None
    )
    c, f = _open_stream(sock, {"language": "en"})
    _send_pcm(c, jfk_audio, key="pcm16")
    c.sendall(b'{"end": true}\n')
    lines, done = _read_stream_lines(f)
    c.close()
    assert done.get("done"), done
    assert done["text"] == ref["text"]
    assert done["duration"] == pytest.approx(11.0, abs=0.05)


def test_server_streaming_bad_line(server):
    """A malformed stream line answers an error line and closes the session
    without wedging the server (a normal request still works after)."""
    sock, _ = server
    c, f = _open_stream(sock, {"language": "en"})
    c.sendall(b'{"neither_pcm_nor_end": 1}\n')
    lines, done = _read_stream_lines(f)
    assert "error" in done
    c.close()
    assert "error" in _request(sock, {"no_audio": 1})  # server still alive


def test_server_streaming_backpressure_bounds_queue(
    server, tpu_model, jfk_audio, monkeypatch
):
    """A client pushing audio faster than the serve thread decodes must not
    grow the event queue without bound: the reader thread stops pulling from
    the socket once enqueued-but-unprocessed audio exceeds
    MAX_STREAM_PENDING_S, and the session still finishes with finals equal
    to batch transcribe()."""
    import time

    from whisper_tpu.server import TranscriptionServer

    sock, srv = server
    monkeypatch.setattr(TranscriptionServer, "MAX_STREAM_PENDING_S", 2.0)

    # 99 s: after the FIRST 30 s window completes, ~69 s of audio (138
    # chunks) is still being pushed while the serve thread decodes — an
    # unbounded queue would absorb most of it; the cap admits ~4 chunks
    long_audio = np.concatenate([jfk_audio] * 9)
    ref = tpu_model.transcribe(
        long_audio, language="en", temperature=0.0, verbose=None
    )

    c, f = _open_stream(sock, {"language": "en"})
    chunk = 8000  # 0.5 s
    max_qsize = [0]
    feeding = [True]

    def watch():
        while feeding[0]:
            max_qsize[0] = max(max_qsize[0], srv._requests.qsize())
            time.sleep(0.005)

    w = threading.Thread(target=watch, daemon=True)
    w.start()
    for i in range(0, len(long_audio), chunk):
        _send_pcm(c, long_audio[i : i + chunk])
    c.sendall(b'{"end": true}\n')
    lines, done = _read_stream_lines(f)
    feeding[0] = False
    w.join(timeout=5)
    c.close()

    assert done.get("done"), done
    finals = [m["segment"] for m in lines if "segment" in m]
    assert done["text"] == ref["text"]
    assert [s["tokens"] for s in finals] == [s["tokens"] for s in ref["segments"]]
    # cap 2 s / 0.5 s chunks -> at most ~4 queued feeds plus scheduling
    # slack; an unbounded queue would hold most of the 66 chunks
    assert max_qsize[0] <= 10, f"queue grew to {max_qsize[0]} events"
