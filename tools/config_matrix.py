#!/usr/bin/env python
"""Run every BASELINE.json config end-to-end through the public API.

BASELINE.json lists five representative configurations the reference is
exercised under (tiny.en greedy, base + language detection + fallback,
small beam-5, turbo beam-5 + word timestamps, large-v3 batched multi-
stream). This driver runs each through `whisper_tpu.transcribe` /
`transcribe_batch` on whatever backend is active, with synthetic random
weights (real checkpoints are not downloadable in the build sandbox), and
prints one JSON line per config: pipeline success + wall time.

Real-weight quality validation lives in tests/test_real_checkpoint.py and
tools/eval_wer.py (both runnable once a checkpoint is cached).

Usage:
  python tools/config_matrix.py                 # full-size models (TPU)
  python tools/config_matrix.py --scaled        # 2-layer stand-ins (CI/CPU)
  python tools/config_matrix.py --configs 1,4   # subset
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def synth_speech(seconds: float, seed: int = 0, sr: int = 16000) -> np.ndarray:
    """Speech-shaped int16-representable noise (AM-modulated lowpass)."""
    rng = np.random.RandomState(seed)
    n = int(seconds * sr)
    x = rng.randn(n).astype(np.float32) * 0.15
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * np.arange(n) / sr))
    q = np.clip(x * env * 32768.0, -32768, 32767).astype(np.int16)
    return q.astype(np.float32) / 32768.0


def scaled_dims(dims, n_layer=2):
    from dataclasses import replace

    return replace(
        dims,
        n_audio_layer=min(dims.n_audio_layer, n_layer),
        n_text_layer=min(dims.n_text_layer, n_layer),
    )


def build(name, scaled):
    from whisper_tpu.models import MODEL_DIMS, Whisper

    dims = MODEL_DIMS[name]
    if scaled:
        dims = scaled_dims(dims)
    return Whisper(dims, params=None, name=name, compute_dtype="bfloat16")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaled", action="store_true",
                    help="2-layer stand-in models (fast; CI/CPU)")
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="audio length per stream")
    args = ap.parse_args()
    wanted = {int(c) for c in args.configs.split(",")}

    import whisper_tpu
    from whisper_tpu.batch import transcribe_batch

    audio = synth_speech(args.seconds)
    jfk = os.path.join(os.path.dirname(__file__), os.pardir, "tests", "data", "jfk.flac")

    def run(n, name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            ok, err = True, None
        except Exception as e:  # pragma: no cover - surface the failure
            out, ok, err = None, False, f"{type(e).__name__}: {e}"
        rec = {
            "config": n,
            "name": name,
            "ok": ok,
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        if ok:
            if isinstance(out, list):
                rec["n_streams"] = len(out)
                rec["segments"] = sum(len(r["segments"]) for r in out)
            else:
                rec["segments"] = len(out["segments"])
                rec["language"] = out.get("language")
        else:
            rec["error"] = err
        print(json.dumps(rec), flush=True)

    if 1 in wanted:
        # reference CPU-path analog: tiny.en greedy on jfk.flac
        model = build("tiny.en", args.scaled)
        run(1, "tiny.en greedy jfk.flac", lambda: whisper_tpu.transcribe(
            model, jfk, language="en", temperature=0.0, verbose=None))

    if 2 in wanted:
        # multilingual + language auto-detection + the full fallback ladder
        model = build("base", args.scaled)
        run(2, "base langdetect + fallback", lambda: whisper_tpu.transcribe(
            model, audio, language=None, verbose=None))

    if 3 in wanted:
        model = build("small", args.scaled)
        run(3, "small beam5", lambda: whisper_tpu.transcribe(
            model, audio, language="en", beam_size=5, temperature=0.0,
            verbose=None))

    if 4 in wanted:
        model = build("turbo", args.scaled)
        run(4, "turbo beam5 word_timestamps", lambda: whisper_tpu.transcribe(
            model, audio, language="en", beam_size=5, word_timestamps=True,
            temperature=0.0, verbose=None))

    if 5 in wanted:
        model = build("large-v3", args.scaled)
        streams = [synth_speech(args.seconds, seed=s) for s in range(4)]
        run(5, "large-v3 batched 4-stream", lambda: transcribe_batch(
            model, streams, language="en", beam_size=5, temperature=0.0))


if __name__ == "__main__":
    main()
