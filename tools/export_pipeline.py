#!/usr/bin/env python
"""Offline conversion driver: model -> native pipeline directory.

The analog of the reference's convert_coreml.sh (convert_coreml.sh:11-36),
which runs its four converters then `make`. This exports every artifact the
native runtime (runtime/wtpu_transcribe.cpp) needs — StableHLO graphs
(encoder / cross-KV / fused greedy / fused beam), weight blobs, logit masks,
tokenizer vocab, manifest — and builds the native binaries.

    python tools/export_pipeline.py --model turbo --out /path/pipeline
    python tools/export_pipeline.py --checkpoint /path/model.pt --out DIR
    whisper_tpu/runtime/wtpu_transcribe DIR audio.flac [--beam]

Unlike the reference there is no fixed sample_len<253 constraint and both
greedy and beam graphs are exported side by side (the reference bakes ONE
beam size per conversion, convert_decoder.py:15).
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="registry name (downloads)")
    ap.add_argument("--checkpoint", default=None, help="local .pt checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--language", default="en")
    ap.add_argument("--task", default="transcribe")
    ap.add_argument("--beam-size", type=int, default=5)
    ap.add_argument("--sample-len", type=int, default=446)
    ap.add_argument(
        "--weights",
        default="bf16",
        choices=["bf16", "int8"],
        help="fused-decode weight storage (int8 = weight-only quantized)",
    )
    ap.add_argument(
        "--random-weights",
        action="store_true",
        help="synthetic weights at the model's dims (offline testing)",
    )
    ap.add_argument("--no-build", action="store_true", help="skip make -C runtime")
    args = ap.parse_args()

    import whisper_tpu
    from whisper_tpu.export import export_pipeline

    if args.checkpoint:
        model = whisper_tpu.load_model(args.checkpoint)
    elif args.random_weights:
        from whisper_tpu.models import MODEL_DIMS, Whisper

        model = Whisper(
            MODEL_DIMS[args.model or "turbo"],
            params=None,
            name=args.model or "turbo",
            compute_dtype="bfloat16",
        )
    elif args.model:
        model = whisper_tpu.load_model(args.model)
    else:
        ap.error("one of --model / --checkpoint / --random-weights required")

    export_pipeline(
        args.out,
        model,
        language=args.language,
        task=args.task,
        sample_len=args.sample_len,
        beam_size=args.beam_size,
        weights=args.weights,
    )
    print(f"exported pipeline -> {args.out}")

    if not args.no_build:
        runtime = os.path.join(os.path.dirname(__file__), os.pardir, "runtime")
        subprocess.run(["make", "-C", runtime], check=True)
        print("native runtime built (whisper_tpu/runtime/wtpu_transcribe)")


if __name__ == "__main__":
    main()
