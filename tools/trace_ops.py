#!/usr/bin/env python
"""Device-op profile of the production frontend or fused-decode programs.

Runs the selected jitted program N times under jax.profiler and prints the
device-time op breakdown, grouped by op category, so optimization work
targets measured sinks instead of guesses.

TRACE_WHAT=frontend traces the one-program clip frontend (mel + encoder +
cross-KV); TRACE_WHAT=decode traces the fused beam-5 decode program on the
frontend's cross-K/V (the bench's headline configuration, 96 steps/iter).

Usage:  python tools/trace_ops.py [model] [n_iters]
Env:    TRACE_WHAT=frontend|decode (default frontend)

NOTE: through the remote-PJRT tunnel the profiler sometimes captures no
device plane at all (service-side); the tool says so loudly instead of
printing a 0.00 ms breakdown.
"""

import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

os.environ.setdefault("XLA_FLAGS", "")

import numpy as np


def parse_xplane(tracedir):
    """Return list of (op_name, category, total_device_us, occurrences)."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True)
    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    import gzip
    import io
    import csv

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data).decode()
        except OSError:
            data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    out = []
    for r in rows:
        if r.get("host_or_device", "").strip() != "Device":
            continue
        out.append(
            (
                r.get("operation", r.get("op_name", "?")),
                r.get("category", "?"),
                float(r.get("total_self_time_us", r.get("total_self_time", 0.0))),
                int(float(r.get("occurrences", 1))),
            )
        )
    return out


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "turbo"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    from whisper_tpu.frontend import clip_frontend
    from whisper_tpu.models import MODEL_DIMS, Whisper

    dims = MODEL_DIMS[model_name]
    model = Whisper(dims, params=None, name=model_name, compute_dtype="bfloat16")
    n_windows = 2
    frontend = clip_frontend(dims.n_mels, dims.n_audio_head, dims.n_text_head, n_windows)

    rng = np.random.RandomState(0)
    audio = (rng.randn((n_windows + 1) * 480000) * 3000).astype(np.int16)
    audio_d = jnp.asarray(audio)

    what = os.environ.get("TRACE_WHAT", "frontend")

    print("warmup (first execute pays the server compile)...", flush=True)
    t0 = time.perf_counter()
    out = frontend(model.params["encoder"], model.params["decoder"], audio_d)
    jax.device_get(jax.tree.leaves(out)[0][0, 0, 0, :1])
    print(f"frontend warm in {time.perf_counter()-t0:.1f}s", flush=True)

    if what == "decode":
        # the bench's headline decode: beam-5, 2 windows batched, fixed 96
        # steps (eot suppressed so every iteration does identical work)
        from whisper_tpu.engine_fused import FusedEngine
        from whisper_tpu.tokenizer import get_tokenizer

        engine = FusedEngine(model)
        tok = get_tokenizer(True, language="en", task="transcribe")
        ck, cv = out
        initial = np.tile(
            np.array([list(tok.sot_sequence)], dtype=np.int32), (n_windows, 1)
        )
        run_kwargs = dict(
            sot_index=0,
            suppress_ids=[tok.eot],
            blank_ids=tok.encode(" ") + [tok.eot],
            max_initial_ts_index=50,
            sample_len=96,
            n_group=5,
            beam_search=True,
            max_candidates=5,
            use_timestamps=True,
            temperature=0.0,
            eot=tok.eot,
            timestamp_begin=tok.timestamp_begin,
            no_timestamps=tok.no_timestamps,
            no_speech=tok.no_speech,
        )

        def run_once():
            res = engine.run(initial, ck, cv, **run_kwargs)
            jax.device_get(jax.tree.leaves(res)[0][:1])

        t0 = time.perf_counter()
        run_once()
        print(f"decode warm in {time.perf_counter()-t0:.1f}s", flush=True)
        tracedir = tempfile.mkdtemp(prefix="trace_decode_")
        with jax.profiler.trace(tracedir):
            for _ in range(n_iters):
                run_once()
    else:
        tracedir = tempfile.mkdtemp(prefix="trace_frontend_")
        with jax.profiler.trace(tracedir):
            for _ in range(n_iters):
                out = frontend(
                    model.params["encoder"], model.params["decoder"], audio_d
                )
            jax.device_get(jax.tree.leaves(out)[0][0, 0, 0, :1])

    rows = parse_xplane(tracedir)
    if not rows:
        print(
            "\nWARNING: profiler captured NO device ops (empty/missing device "
            "plane in the xplane dump). Through the remote-PJRT tunnel this "
            "happens when the service replica doesn't stream device traces "
            "back; re-run, or profile on a directly-attached chip. The "
            "numbers below are meaningless.",
            flush=True,
        )
    rows.sort(key=lambda r: -r[2])
    total = sum(r[2] for r in rows)
    print(f"\ntotal device time: {total/n_iters/1000:.2f} ms/iter over {n_iters} iters")
    by_cat = defaultdict(float)
    for name, cat, us, occ in rows:
        by_cat[cat] += us
    print("\nby category (ms/iter):")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us/n_iters/1000:8.3f}  {cat}")
    print("\ntop 40 ops (ms/iter, occurrences/iter):")
    for name, cat, us, occ in rows[:40]:
        print(f"  {us/n_iters/1000:8.3f}  {occ/n_iters:6.1f}x  [{cat}] {name[:110]}")


if __name__ == "__main__":
    main()
