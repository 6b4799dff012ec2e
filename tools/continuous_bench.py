#!/usr/bin/env python
"""Continuous-batching serving bench: N requests of mixed lengths drain
through a fixed-slot ContinuousBatcher on the live chip.

Measures the SCHEDULER's value — window-granular slot reuse — not model
quality (weights are random, so decoding settings are pinned deterministic:
greedy t=0, no ladder, no conditioning, no-speech gate off). Reports
makespan, aggregate x-realtime, and per-request completion latency.

Usage: python tools/continuous_bench.py [slots] [n_requests]
Env:   BENCH_MODEL (default turbo)
       CONT_HEDGE=N  — hedge the replica lottery like bench.py: N staggered
       worker processes race to finish warmup; the first warm one runs the
       timed passes after the losers are killed (a fresh process draws a
       service replica whose first-execute cost spans seconds to minutes,
       so an unhedged run measures the draw, not the scheduler).
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("WHISPER_TPU_CACHE_DIR", os.path.join(REPO, ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from whisper_tpu.continuous import ContinuousBatcher  # noqa: E402
from whisper_tpu.models import MODEL_DIMS, Whisper  # noqa: E402


_BATCHER_CACHE = {}  # (model id, slots) -> warmed ContinuousBatcher


def prepare_batcher(model, slots, lengths_s, rng):
    """Build (or reuse) a ContinuousBatcher and warm its bucketed programs
    on the workload's distinct clip lengths. Returns (batcher, warm_s);
    warm_s is 0.0 on a cache hit (resident-daemon reuse)."""
    key = (id(model), slots)
    if key in _BATCHER_CACHE:
        return _BATCHER_CACHE[key], 0.0
    cb = ContinuousBatcher(
        model,
        slots=slots,
        language="en",
        temperature=0.0,
        no_speech_threshold=None,
        condition_on_previous_text=False,
        sample_len=64,
    )
    # warmup: drain a throwaway request set so the fused graph for
    # n_audio == slots (and helper programs) compile outside the timed run.
    # Clip lengths cycle the WORKLOAD's distinct lengths: the device-mel
    # window-slice programs are keyed per mel-length bucket, and under the
    # axon service a program's real compile happens at first EXECUTION —
    # warming a different bucket leaves the first timed round paying it.
    t_w = time.perf_counter()
    warm_lengths = sorted(set(lengths_s))
    for i in range(slots):
        sec = warm_lengths[i % len(warm_lengths)]
        cb.submit((rng.randn(sec * 16000) * 0.1).astype(np.float32))
    cb.drain()
    warm_s = time.perf_counter() - t_w
    _BATCHER_CACHE[key] = cb
    return cb, warm_s


def workload(n_req, seed=0):
    rng = np.random.RandomState(seed)
    lengths_s = [30 if i % 2 else 60 for i in range(n_req)]
    audios = [
        (rng.randn(sec * 16000) * 0.1).astype(np.float32) for sec in lengths_s
    ]
    return rng, lengths_s, audios


def run_serving_bench(model, slots, n_req):
    """The measurement core, callable from this CLI or from a resident warm
    process (bench.py daemon `cont` command): warm the batcher, then run two
    timed passes (first may absorb residual server-side compiles; the second
    is the honest scheduler number). Returns the result dict."""
    rng, lengths_s, audios = workload(n_req)
    cb, warm_s = prepare_batcher(model, slots, lengths_s, rng)

    def run_pass():
        """Submit the full request set and drain it; returns timing stats."""
        stats0 = dict(cb.stats)
        t_submit = time.perf_counter()
        tickets = [cb.submit(a) for a in audios]
        done_at = {}
        t0 = time.perf_counter()
        rounds = 0
        while cb.step():
            rounds += 1
            now = time.perf_counter() - t0
            for t in tickets:
                if cb.ready(t) and t not in done_at:
                    done_at[t] = now
        makespan = time.perf_counter() - t0
        for t in tickets:
            cb.pop(t)
        lats = sorted(done_at.values())
        return dict(
            rounds=rounds,
            makespan_s=round(makespan, 3),
            aggregate_rtfx=round(sum(lengths_s) / max(makespan, 1e-9), 1),
            latency_mean_s=round(float(np.mean(lats)), 3),
            latency_p95_s=round(float(np.percentile(lats, 95)), 3),
            submit_overhead_s=round(t0 - t_submit, 3),
            # where the rounds' wall time went (batcher phase accumulators)
            phases_s={
                k.replace("_seconds_sum", ""): round(cb.stats[k] - stats0[k], 3)
                for k in ("mel_seconds_sum", "decode_seconds_sum",
                          "apply_seconds_sum")
            },
        )

    first = run_pass()
    warm = run_pass()
    return {
        "model": model.name,
        "slots": slots,
        "requests": n_req,
        "audio_seconds": sum(lengths_s),
        **first,
        "warm_pass": warm,
        "warmup_s": round(warm_s, 1),
    }


def main():
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    model_name = os.environ.get("BENCH_MODEL", "turbo")
    dims = MODEL_DIMS[model_name]
    model = Whisper(dims, params=None, name=model_name, compute_dtype="bfloat16")

    rng, lengths_s, audios = workload(n_req)
    cb, warm_s = prepare_batcher(model, slots, lengths_s, rng)

    # hedge-worker gate: probe this process's replica speed with one
    # throwaway pass, report READY + the probe, then hold the timed passes
    # until the parent picks the FASTEST ready replica and kills the rest
    # (their in-flight server-side compiles would otherwise load the
    # service during the measurement window)
    out_path = os.environ.get("CONT_WORKER_OUT")
    if out_path:
        t_p = time.perf_counter()
        for a in audios[: min(slots, n_req)]:
            cb.submit(a)
        cb.drain()
        probe_s = time.perf_counter() - t_p
        with open(out_path, "w", buffering=1) as f:
            f.write(f"READY {warm_s:.1f} {probe_s:.3f}\n")
        go = os.environ.get("CONT_GO_FILE")
        t0 = time.time()
        while go and not os.path.exists(go) and time.time() - t0 < 300:
            time.sleep(0.1)

    # two measured passes: the first may still absorb server-side compiles
    # of this run's program shapes on a cold service replica; the second is
    # the honest scheduler number (everything resident)
    result = run_serving_bench(model, slots, n_req)
    result["warmup_s"] = round(warm_s, 1)
    if out_path:
        with open(out_path, "a", buffering=1) as f:
            f.write(json.dumps(result) + "\n")
    print(json.dumps(result), flush=True)


def main_hedged(n_workers: int):
    """bench.py's hedged-warmup pattern for the serving bench: N staggered
    identical workers, first to warm wins; losers are killed before the
    winner's timed passes so their server-side compiles stay out of the
    measurement window."""
    import signal
    import subprocess
    import tempfile
    import threading

    t0 = time.perf_counter()
    tmpdir = tempfile.mkdtemp(prefix="cont_hedge_")
    workers = []
    stagger_s = float(os.environ.get("CONT_STAGGER_S", "25"))
    winner_found = threading.Event()

    def spawn(i):
        out = os.path.join(tmpdir, f"w{i}.jsonl")
        env = dict(os.environ)
        env.pop("CONT_HEDGE", None)
        env["CONT_WORKER_OUT"] = out
        env["CONT_GO_FILE"] = os.path.join(tmpdir, f"w{i}.go")
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        workers.append((p, out))

    spawn(0)

    def spawner():
        for i in range(1, n_workers):
            if winner_found.wait(timeout=stagger_s):
                return
            spawn(i)

    threading.Thread(target=spawner, daemon=True).start()

    def lines(path):
        try:
            with open(path) as f:
                return [l for l in f.read().splitlines() if l.strip()]
        except FileNotFoundError:
            return []

    # wait for the first READY, then give later workers a grace window to
    # also report; pick the FASTEST probe (the point of hedging is a fast
    # replica, and warm-first is only weakly correlated with round speed)
    grace_s = float(os.environ.get("CONT_GRACE_S", "90"))
    ready = {}  # i -> probe seconds
    first_ready_at = None
    while True:
        time.sleep(0.5)
        for i, (p, path) in enumerate(list(workers)):
            if i in ready:
                continue
            ls = lines(path)
            if ls and ls[0].startswith("READY"):
                ready[i] = float(ls[0].split()[2])
                if first_ready_at is None:
                    first_ready_at = time.perf_counter()
                    warmup_s = first_ready_at - t0
        if ready and (
            len(ready) == len(workers)
            or time.perf_counter() - first_ready_at > grace_s
        ):
            break
        if not ready and all(p.poll() is not None for p, _ in workers):
            raise RuntimeError("every hedge worker died before warmup")
    winner = min(ready, key=ready.get)
    winner_found.set()

    for i, (p, path) in enumerate(list(workers)):
        if i != winner and p.poll() is None:
            p.send_signal(signal.SIGTERM)
    time.sleep(2.0)
    with open(os.path.join(tmpdir, f"w{winner}.go"), "w"):
        pass

    p, path = workers[winner]
    while len(lines(path)) < 2:
        if p.poll() is not None and len(lines(path)) < 2:
            raise RuntimeError("hedge winner died before reporting")
        time.sleep(0.5)
    result = json.loads(lines(path)[1])
    result["hedge"] = {
        "workers": n_workers,
        "spawned": len(workers),
        "winner": winner,
        "time_to_first_warm_s": round(warmup_s, 1),
        "probe_s": {str(i): round(v, 2) for i, v in ready.items()},
    }
    print(json.dumps(result), flush=True)


def try_daemon(slots, n_req):
    """Probe the bench warm-daemon (bench.py BENCH_ROLE=daemon). On a ready
    daemon serving the same model, run the serving bench IN the resident
    process — the production posture, and immune to the fresh-process
    replica lottery. Returns the result dict or None (-> cold path)."""
    import socket

    sock_path = os.environ.get(
        "CONT_DAEMON_SOCK", os.path.join(REPO, ".bench_daemon.sock")
    )
    if not os.path.exists(sock_path):
        return None

    def ask(payload, timeout):
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        try:
            c.settimeout(timeout)
            c.connect(sock_path)
            c.sendall((json.dumps(payload) + "\n").encode())
            buf = b""
            while b"\n" not in buf:
                chunk = c.recv(65536)
                if not chunk:
                    return None
                buf += chunk
            return json.loads(buf.decode())
        except (OSError, ValueError):
            return None
        finally:
            c.close()

    info = ask({"cmd": "ping"}, timeout=5)
    model_name = os.environ.get("BENCH_MODEL", "turbo")
    if (
        not info
        or not info.get("ready")
        or info.get("config", {}).get("model") != model_name
    ):
        return None
    r = ask({"cmd": "cont", "slots": slots, "n": n_req}, timeout=1800)
    if not r or "error" in r:
        # e.g. a resident daemon predating the `cont` command replies
        # {"error": "unknown cmd 'cont'"} — fall back to the cold path
        # rather than recording an error line as the measurement
        return None
    r["mode"] = "warm_daemon"
    return r


if __name__ == "__main__":
    n_hedge = int(os.environ.get("CONT_HEDGE", "1"))
    if not os.environ.get("CONT_COLD") and not os.environ.get("CONT_WORKER_OUT"):
        _slots = int(sys.argv[1]) if len(sys.argv) > 1 else 4
        _n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        _r = try_daemon(_slots, _n)
        if _r is not None:
            print(json.dumps(_r), flush=True)
            sys.exit(0)
    if n_hedge > 1 and not os.environ.get("CONT_WORKER_OUT"):
        main_hedged(n_hedge)
    else:
        main()
