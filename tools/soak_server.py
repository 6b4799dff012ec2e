#!/usr/bin/env python
"""Serving soak: N requests through the unix-socket daemon, RSS tracked.

Evidence for long-running production serving: host memory must be FLAT per
request (the reference is a one-shot CLI and never faces this; a daemon
that grows per request OOMs in days). Drives the real TranscriptionServer
over its socket with concurrent clients in waves, samples the process RSS
every wave, and reports start/end RSS plus a per-100-requests growth slope
fitted over the tail (the first waves are excluded — jit caches, program
buckets, and allocator pools legitimately grow once before steady state).

Defaults run a 2-layer synthetic model on the CPU backend so the soak can
run anywhere (device buffers are host RSS there, so device-side leaks show
too); SOAK_MODEL=turbo runs the real model graph on the chip.

Usage: python tools/soak_server.py [requests] [slots]
Env:   SOAK_MODEL   (default: synthetic tiny 2-layer)
       SOAK_WAVE    concurrent clients per wave (default 4)
       SOAK_HTTP=1  soak the OpenAI-compatible HTTP server instead of the
                    unix-socket daemon (same batcher underneath)
"""

import json
import os
import socket
import sys
import tempfile
import threading
import time
import wave as wavmod

os.environ.setdefault("XLA_FLAGS", "")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

if not os.environ.get("SOAK_MODEL"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("WHISPER_TPU_CACHE_DIR", os.path.join(REPO, ".jax_cache")),
)

from whisper_tpu.models import MODEL_DIMS, Whisper  # noqa: E402
from whisper_tpu.models.dims import ModelDimensions  # noqa: E402
from whisper_tpu.server import TranscriptionServer  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def write_wav(path: str, seconds: float, seed: int) -> None:
    rng = np.random.RandomState(seed)
    pcm = (rng.randn(int(seconds * 16000)) * 0.05 * 32767).astype(np.int16)
    with wavmod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


def request(sock_path: str, payload: dict, timeout=600.0) -> dict:
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


def request_http(url: str, path: str, timeout=600.0) -> dict:
    import urllib.error
    import urllib.request
    import uuid

    with open(path, "rb") as f:
        data = f.read()
    boundary = uuid.uuid4().hex
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="{os.path.basename(path)}"\r\n\r\n'.encode()
        + data
        + f"\r\n--{boundary}--\r\n".encode()
    )
    req = urllib.request.Request(
        f"{url}/v1/audio/transcriptions",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())
    except urllib.error.HTTPError as e:
        return json.loads(e.read())


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    wave_size = int(os.environ.get("SOAK_WAVE", "4"))
    model_name = os.environ.get("SOAK_MODEL")

    if model_name:
        dims = MODEL_DIMS[model_name]
        model = Whisper(dims, params=None, name=model_name, compute_dtype="bfloat16")
    else:
        model_name = "synthetic-tiny"
        dims = ModelDimensions(
            n_mels=80, n_audio_ctx=1500, n_audio_state=128, n_audio_head=2,
            n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=128,
            n_text_head=2, n_text_layer=2,
        )  # fmt: skip
        model = Whisper(dims, params=None, name=model_name, compute_dtype="float32")

    tmp = tempfile.mkdtemp(prefix="soak_")
    # mixed lengths: two 1-window clips and one 2-window clip rotate, so slot
    # turnover (the admission path) and multi-round streams both soak
    paths = []
    for i, sec in enumerate([4.0, 9.0, 35.0]):
        p = os.path.join(tmp, f"clip{i}.wav")
        write_wav(p, sec, seed=i)
        paths.append(p)

    use_http = os.environ.get("SOAK_HTTP") == "1"
    opts = dict(
        slots=slots, language="en", temperature=0.0,
        no_speech_threshold=None, condition_on_previous_text=False,
        sample_len=16,
    )  # fmt: skip
    if use_http:
        from whisper_tpu.http_server import TranscriptionHTTPServer

        srv = TranscriptionHTTPServer(model, "127.0.0.1", 0, **opts)
        url = f"http://{srv.host}:{srv.port}"
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
    else:
        sock = os.path.join(tmp, "wtpu.sock")
        srv = TranscriptionServer(model, sock, **opts)
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        for _ in range(200):
            try:
                s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                s.connect(sock)
                s.close()
                break
            except OSError:
                time.sleep(0.05)

    ok = err = 0
    lock = threading.Lock()

    def client(i):
        nonlocal ok, err
        path = paths[i % len(paths)]
        if use_http:
            r = request_http(url, path)
        else:
            r = request(sock, {"audio": path})
        with lock:
            if isinstance(r, dict) and "text" in r:
                ok += 1
            else:
                err += 1

    samples = []  # (requests_done, rss_mb)
    done = 0
    t0 = time.time()
    while done < n_req:
        n = min(wave_size, n_req - done)
        threads = [threading.Thread(target=client, args=(done + j,)) for j in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        done += n
        samples.append((done, rss_mb()))
        if done % (10 * wave_size) < wave_size:
            print(f"  {done}/{n_req} requests, rss {samples[-1][1]:.1f} MB", flush=True)
    wall = time.time() - t0
    srv.shutdown()

    # slope over the tail (skip the first third: jit caches/allocator warm-up)
    tail = samples[len(samples) // 3 :]
    xs = np.array([s[0] for s in tail], float)
    ys = np.array([s[1] for s in tail], float)
    slope_per_100 = float(np.polyfit(xs, ys, 1)[0] * 100) if len(tail) > 2 else None

    b = srv.batcher
    in_flight = srv._pending_for_ticket if use_http else srv._conn_for_ticket
    state_empty = (
        not in_flight and not b._streams and not b._langs
        and not b._results and not b._queue
    )  # fmt: skip
    print(json.dumps({
        "metric": "serving_soak",
        "transport": "http" if use_http else "unix-socket",
        "model": model_name,
        "backend": jax.devices()[0].platform,
        "requests": n_req,
        "slots": slots,
        "wave": wave_size,
        "ok": ok,
        "errors": err,
        "wall_s": round(wall, 1),
        "rss_start_mb": round(samples[0][1], 1),
        "rss_end_mb": round(samples[-1][1], 1),
        "rss_growth_tail_mb_per_100req": (
            round(slope_per_100, 3) if slope_per_100 is not None else None
        ),
        "state_empty_after_drain": state_empty,
    }))  # fmt: skip


if __name__ == "__main__":
    main()
