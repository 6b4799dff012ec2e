#!/usr/bin/env python
"""WER evaluation utility.

The reference evaluates WER in a notebook with jiwer + its English normalizer
(/root/reference/notebooks/LibriSpeech.ipynb). This is the equivalent as a
CLI tool with a self-contained Levenshtein WER (no jiwer dependency):

  python tools/eval_wer.py --ref ref.txt --hyp hyp.txt [--language en]
  python tools/eval_wer.py --ref-dir refs/ --audio-dir wavs/ --model tiny.en
  python tools/eval_wer.py --librispeech ~/data/LibriSpeech/test-clean --model turbo

In the second form each refs/<name>.txt is compared against the
transcription of <audio-dir>/<name>.*. The third form walks the official
LibriSpeech layout (<spk>/<chap>/<spk>-<chap>-<utt>.flac with
<spk>-<chap>.trans.txt reference lines) — see data/README.md for the full
dataset recipe.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def word_error_rate(ref_words, hyp_words) -> float:
    """Levenshtein distance over words / reference length."""
    n, m = len(ref_words), len(hyp_words)
    if n == 0:
        return float(m > 0)
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ref_words[i - 1] != hyp_words[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return float(prev[m]) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", help="reference transcript file")
    ap.add_argument("--hyp", help="hypothesis transcript file")
    ap.add_argument("--ref-dir", help="directory of <name>.txt references")
    ap.add_argument("--audio-dir", help="directory of audio files to transcribe")
    ap.add_argument(
        "--librispeech",
        help="LibriSpeech split root (e.g. .../LibriSpeech/test-clean); "
        "uses the official *.trans.txt references",
    )
    ap.add_argument("--limit", type=int, help="evaluate at most N utterances")
    ap.add_argument("--model", default="tiny.en")
    ap.add_argument("--language", default="en")
    ap.add_argument(
        "--dtype",
        default="bfloat16",
        help="compute dtype for the model (bfloat16 for TPU, float32 to "
        "match CPU-reference transcripts exactly)",
    )
    ap.add_argument(
        "--temperature",
        help="decode temperature(s), comma-separated (e.g. '0' to disable "
        "the fallback ladder for deterministic runs); default: the "
        "standard 0..1.0 ladder",
    )
    ap.add_argument(
        "--weights",
        default="",
        choices=["", "int8"],
        help="decode-weight mode ('int8' = weight-only quantized serving "
        "mode; used by validate_real.py to measure the bf16-vs-int8 WER "
        "delta)",
    )
    args = ap.parse_args()
    if args.weights:
        # same plumbing as the CLI's --weights flag: the engines read it
        os.environ["WHISPER_TPU_WEIGHTS"] = args.weights

    transcribe_kw = {}
    if args.temperature is not None:
        temps = tuple(float(t) for t in args.temperature.split(","))
        transcribe_kw["temperature"] = temps[0] if len(temps) == 1 else temps

    from whisper_tpu.normalizers import BasicTextNormalizer, EnglishTextNormalizer

    normalizer = (
        EnglishTextNormalizer() if args.language == "en" else BasicTextNormalizer()
    )

    pairs = []
    if args.ref and args.hyp:
        pairs.append((open(args.ref).read(), open(args.hyp).read()))
    elif args.librispeech:
        import whisper_tpu

        # collect (flac, reference) pairs from the official layout
        items = []
        for dirpath, _, files in sorted(os.walk(args.librispeech)):
            refs = {}
            for f in files:
                if f.endswith(".trans.txt"):
                    for line in open(os.path.join(dirpath, f)):
                        utt, _, text = line.strip().partition(" ")
                        refs[utt] = text
            for f in sorted(files):
                if f.endswith(".flac"):
                    utt = f[: -len(".flac")]
                    if utt in refs:
                        items.append((os.path.join(dirpath, f), refs[utt]))
        if args.limit:
            items = items[: args.limit]
        if not items:
            ap.error(f"no LibriSpeech utterances found under {args.librispeech}")
        print(f"evaluating {len(items)} utterances with {args.model}", file=sys.stderr)

        model = whisper_tpu.load_model(args.model, compute_dtype=args.dtype)
        for i, (audio, ref) in enumerate(items):
            result = model.transcribe(
                audio, language=args.language, verbose=None, **transcribe_kw
            )
            pairs.append((ref, result["text"]))
            if (i + 1) % 50 == 0:
                print(f"  {i + 1}/{len(items)}", file=sys.stderr)
    elif args.ref_dir and args.audio_dir:
        import whisper_tpu

        model = whisper_tpu.load_model(args.model, compute_dtype=args.dtype)
        for fname in sorted(os.listdir(args.ref_dir)):
            if not fname.endswith(".txt"):
                continue
            stem = fname[:-4]
            audio = next(
                (
                    os.path.join(args.audio_dir, f)
                    for f in os.listdir(args.audio_dir)
                    if f.rsplit(".", 1)[0] == stem
                ),
                None,
            )
            if audio is None:
                print(f"skipping {stem}: no matching audio", file=sys.stderr)
                continue
            result = model.transcribe(
                audio, language=args.language, verbose=None, **transcribe_kw
            )
            pairs.append((open(os.path.join(args.ref_dir, fname)).read(), result["text"]))
    else:
        ap.error("provide --ref/--hyp, --ref-dir/--audio-dir, or --librispeech")

    total_err, total_words = 0.0, 0
    for ref, hyp in pairs:
        r = normalizer(ref).split()
        h = normalizer(hyp).split()
        wer = word_error_rate(r, h)
        total_err += wer * len(r)
        total_words += len(r)
        print(f"WER {wer:.4f}  ({len(r)} ref words)")

    if total_words:
        print(f"\noverall WER: {total_err / total_words:.4f} over {total_words} words")


if __name__ == "__main__":
    main()
