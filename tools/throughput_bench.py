#!/usr/bin/env python
"""Multi-stream throughput benchmark (BASELINE config 5: long-form batched
transcribe, multi-stream on one chip).

Measures aggregate real-time factor when N independent 60 s streams are
transcribed concurrently via whisper_tpu.batch.transcribe_batch (lockstep
windows, one batched encode + one batched decode loop per round). The
reference can only process files sequentially (its compiled graphs are fixed
at batch 1), so its multi-stream throughput equals its single-stream RTF.

Usage: python tools/throughput_bench.py [--model large-v3] [--streams 8]
       [--greedy] (beam search is the default, beam 5)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def synth_audio(seconds: int, seed: int, sr: int = 16000) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n = seconds * sr
    x = rng.randn(n).astype(np.float32) * 0.2
    env = 0.5 * (1 + np.sin(2 * np.pi * (2.0 + seed * 0.3) * np.arange(n) / sr))
    return (x * env).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from whisper_tpu.batch import transcribe_batch
    from whisper_tpu.models import MODEL_DIMS, Whisper

    dims = MODEL_DIMS[args.model]
    model = Whisper(dims, params=None, name=args.model, compute_dtype="bfloat16")

    audios = [synth_audio(args.seconds, seed=i) for i in range(args.streams)]
    kwargs = dict(
        language="en",
        temperature=0.0,
        condition_on_previous_text=False,  # streams stay batched (no prompt divergence)
        no_speech_threshold=None,  # deterministic workload with random weights
        logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    if not args.greedy:
        kwargs["beam_size"] = 5

    t0 = time.perf_counter()
    transcribe_batch(model, audios, **kwargs)
    warm = time.perf_counter() - t0

    times = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        transcribe_batch(model, audios, **kwargs)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    total_audio = args.streams * args.seconds
    rtf = total_audio / p50

    print(
        json.dumps(
            {
                "metric": f"throughput_{args.model}_{args.streams}streams"
                + ("_greedy" if args.greedy else "_bs5"),
                "value": round(rtf, 2),
                "unit": "aggregate_x_realtime_per_chip",
                "p50_batch_latency_s": round(p50, 2),
                "warmup_s": round(warm, 1),
                "streams": args.streams,
            }
        )
    )


if __name__ == "__main__":
    main()
