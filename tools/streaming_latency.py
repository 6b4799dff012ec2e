#!/usr/bin/env python
"""First-partial streaming latency on the live chip (VERDICT r3 #6).

Feeds 1 s PCM chunks into a StreamingTranscriber(partial_hop_s=1.0) and
measures the wall time of each feed() that produced a partial — i.e. how
long after audio arrives a listener sees advisory text. The first feed
after warmup is the headline: it must come in under 2 s for the "live
audio" serving claim to hold.

Usage: python tools/streaming_latency.py [seconds=12]
Env:   BENCH_MODEL (default turbo)
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

from whisper_tpu.models import MODEL_DIMS, Whisper  # noqa: E402
from whisper_tpu.streaming import StreamingTranscriber  # noqa: E402


def main():
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    model_name = os.environ.get("BENCH_MODEL", "turbo")
    dims = MODEL_DIMS[model_name]
    model = Whisper(dims, params=None, name=model_name, compute_dtype="bfloat16")

    rng = np.random.RandomState(0)
    audio = (rng.randn(seconds * 16000) * 0.1).astype(np.float32)

    opts = dict(
        language="en",
        temperature=0.0,
        no_speech_threshold=None,
        partial_hop_s=1.0,
    )

    # warmup: compile the window decode + mel outside the measurement
    t_w = time.perf_counter()
    warm = StreamingTranscriber(model, **opts)
    warm.feed(audio[:16000])
    warm_s = time.perf_counter() - t_w

    st = StreamingTranscriber(model, **opts)
    partial_feed_s = []
    first_partial_s = None
    t0 = time.perf_counter()
    for i in range(seconds):
        t_f = time.perf_counter()
        out = st.feed(audio[i * 16000 : (i + 1) * 16000])
        dt = time.perf_counter() - t_f
        if any(s.get("partial") for s in out):
            partial_feed_s.append(dt)
            if first_partial_s is None:
                first_partial_s = time.perf_counter() - t0
    st.flush()

    print(
        json.dumps(
            {
                "model": model_name,
                "chunks_fed": seconds,
                "partials": len(partial_feed_s),
                # wall from stream start to the first advisory text
                "first_partial_s": round(first_partial_s or -1.0, 3),
                # steady per-partial decode cost (the re-decode of the open
                # padded window each hop)
                "partial_feed_p50_s": round(
                    float(np.median(partial_feed_s)) if partial_feed_s else -1.0, 3
                ),
                "warmup_s": round(warm_s, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
