#!/usr/bin/env python
"""On-chip record for the Pallas DTW / median kernels (VERDICT r3 weak #4).

Runs the WHISPER_TPU_PALLAS=1 kernel pair LIVE on the TPU at real
word-alignment sizes and reports device-path wall time vs the default host
path, plus result equality — the evidence for promoting the kernels or
marking them parity-only in ops/pallas_kernels.py.

Usage: python tools/pallas_probe.py
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

from whisper_tpu.ops.dtw import dtw as dtw_host  # noqa: E402
from whisper_tpu.ops.median import median_filter_np  # noqa: E402
from whisper_tpu.ops.pallas_kernels import (  # noqa: E402
    dtw_pallas,
    median_filter_pallas,
)


def timed(fn, *args, reps=5):
    fn(*args)  # warm (compile on first pallas call)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    report = {"device": str(jax.devices()[0]), "dtw": {}, "median": {}}

    # DTW at word-alignment sizes: (text tokens, 1500 audio frames)
    for n_tok in (112, 224, 448):
        x = rng.randn(n_tok, 1500).astype(np.float32)
        host_path, host_s = timed(dtw_host, -x)
        pallas_path, pallas_s = timed(lambda a: dtw_pallas(a, interpret=False), -x)
        report["dtw"][f"{n_tok}x1500"] = {
            "host_ms": round(host_s * 1e3, 2),
            "pallas_ms": round(pallas_s * 1e3, 2),
            "identical": bool(np.array_equal(host_path, pallas_path)),
        }

    # median filter at alignment-matrix sizes: (heads, tokens, 1500), width 7
    for heads, n_tok in ((8, 224), (40, 448)):
        m = rng.randn(heads, n_tok, 1500).astype(np.float32)
        host_out, host_s = timed(median_filter_np, m, 7)
        pallas_out, pallas_s = timed(
            lambda a: median_filter_pallas(a, 7, interpret=False), m
        )
        report["median"][f"{heads}x{n_tok}x1500_w7"] = {
            "host_ms": round(host_s * 1e3, 2),
            "pallas_ms": round(pallas_s * 1e3, 2),
            "max_abs_diff": float(np.max(np.abs(host_out - pallas_out))),
        }

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
