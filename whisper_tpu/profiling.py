"""Lightweight per-graph wall-clock accounting + optional XLA profiler.

The reference keeps module-global accumulators for load/encoder/decoder256/
decoder1/crossKV time and prints a report after each file
(/root/reference/whisper/coreml.py:7-13,247-263; showCoremlPredictTime called
from the CLI, transcribe.py:633-634). This is the TPU equivalent:

  * `timed(name)` context manager / `record(name, seconds)` accumulate
    per-graph host-side wall clock (includes dispatch + device time since
    callers block on results);
  * compile time is tracked separately from steady-state time by counting
    the first call of each (name, shape-key) as "compile" — the analog of
    the reference's ANECompilerService load-time accounting;
  * `report()` renders the summary; `reset()` clears it;
  * `trace(path)` wraps a block in jax.profiler for deep dives.
"""

import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

_lock = threading.Lock()
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)
_first_call_time: Dict[str, float] = {}

enabled = True

# When True, graph wrappers block on their results so timed() spans cover
# dispatch + device execution (precise per-graph accounting — the
# showCoremlPredictTime analog). Default OFF: under the remote-PJRT axon
# plugin `block_until_ready` costs a full tunnel round trip (~15-90 ms)
# per call WITHOUT actually guaranteeing completion, taxing every window
# of the product path for timing fidelity nobody asked for. JAX's async
# dispatch semantics make the non-blocking form correct everywhere —
# downstream use of the arrays forces completion.
sync_for_timing = os.environ.get("WHISPER_TPU_PROFILE") == "1"


def maybe_block(x):
    """Block on a device array for timing fidelity, only when profiling
    mode (WHISPER_TPU_PROFILE=1) requests it."""
    if sync_for_timing:
        x.block_until_ready()
    return x


def record(name: str, seconds: float):
    if not enabled:
        return
    with _lock:
        if name not in _first_call_time:
            _first_call_time[name] = seconds
        else:
            _totals[name] += seconds
            _counts[name] += 1


@contextmanager
def timed(name: str):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record(name, time.perf_counter() - t0)


def reset():
    with _lock:
        _totals.clear()
        _counts.clear()
        _first_call_time.clear()


def summary() -> Dict[str, Dict[str, float]]:
    with _lock:
        names = set(_totals) | set(_first_call_time)
        return {
            name: {
                "first_call_s": _first_call_time.get(name, 0.0),
                "steady_total_s": _totals.get(name, 0.0),
                "steady_calls": _counts.get(name, 0),
                "steady_mean_ms": (
                    1000.0 * _totals[name] / _counts[name] if _counts.get(name) else 0.0
                ),
            }
            for name in sorted(names)
        }


def report() -> str:
    lines = [
        f"{'graph':<18} {'first(s)':>9} {'calls':>6} {'total(s)':>9} {'mean(ms)':>9}"
    ]
    for name, s in summary().items():
        lines.append(
            f"{name:<18} {s['first_call_s']:>9.3f} {s['steady_calls']:>6d} "
            f"{s['steady_total_s']:>9.3f} {s['steady_mean_ms']:>9.2f}"
        )
    return "\n".join(lines)


def print_report():
    print("--- whisper_tpu graph timing (first call includes compilation) ---")
    print(report())


@contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
