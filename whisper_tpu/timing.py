"""Word-level timestamps via cross-attention DTW alignment.

Mirrors the reference pipeline (/root/reference/whisper/timing.py): replay the
window's token sequence through the decoder prefill, collect the
alignment-head cross-attention scores, softmax over audio frames, z-normalize
per head, median-filter, average heads, DTW the negative matrix, and map
text-index jumps to word boundaries. The replay runs as one batched
`prefill_with_alignment` graph (the reference's Decoder256
out_cross_head_weights path, decoder.py:306-313); DTW runs on the numpy
anti-diagonal path by default with an on-device lax.scan variant available
(ops/dtw.py).

PROVENANCE: the compute path (device alignment replay, DTW, median filter)
is original TPU code; the word-merge / anomaly-clamp heuristic half of this
file (punctuation merging, median-duration clamps, pause-boundary snapping)
is deliberately expressed close to the reference source
(/root/reference/whisper/timing.py:234-377, itself openai/whisper, MIT
license) because word-boundary placement is a golden-pinned parity contract
(tests/test_transcribe.py word-timing assertions). Treat that range of the
reference as the semantic spec for those helpers.
"""

import os
import warnings
from dataclasses import dataclass
from typing import TYPE_CHECKING, List

import numpy as np

from .audio import HOP_LENGTH, SAMPLE_RATE, TOKENS_PER_SECOND
from .models.graphs import PREFILL_LEN
from .ops.dtw import dtw as dtw_default
from .ops.median import median_filter_np
from .tokenizer import Tokenizer

if TYPE_CHECKING:
    from .models.whisper import Whisper


def _use_pallas() -> bool:
    return bool(os.environ.get("WHISPER_TPU_PALLAS"))


def _use_device_align() -> bool:
    """Process alignment weights on device (one fused replay program; only
    the (tokens, frames) cost matrix crosses the host boundary). Default on;
    WHISPER_TPU_DEVICE_ALIGN=0 selects the float64 host path, which is the
    reference-fidelity oracle the device path is tested against."""
    return os.environ.get("WHISPER_TPU_DEVICE_ALIGN", "1") != "0"


def median_filter(x: np.ndarray, filter_width: int) -> np.ndarray:
    if _use_pallas():
        from .ops.pallas_kernels import median_filter_pallas

        return median_filter_pallas(x, filter_width)
    return median_filter_np(x, filter_width)


def dtw(x) -> np.ndarray:
    if _use_pallas():
        from .ops.pallas_kernels import dtw_pallas

        return dtw_pallas(x)
    return dtw_default(x)


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


def find_alignment(
    model: "Whisper",
    tokenizer: Tokenizer,
    text_tokens: List[int],
    num_frames: int,
    ck,
    cv,
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
) -> List[WordTiming]:
    if len(text_tokens) == 0:
        return []

    tokens = [
        *tokenizer.sot_sequence,
        tokenizer.no_timestamps,
        *text_tokens,
        tokenizer.eot,
    ]
    if len(tokens) > PREFILL_LEN:
        warnings.warn(
            f"alignment sequence of {len(tokens)} tokens exceeds the "
            f"{PREFILL_LEN}-token replay window; truncating"
        )
        keep = PREFILL_LEN - len(tokenizer.sot_sequence) - 2
        text_tokens = text_tokens[:keep]
        tokens = [
            *tokenizer.sot_sequence,
            tokenizer.no_timestamps,
            *text_tokens,
            tokenizer.eot,
        ]

    n = len(tokens)
    sot_len = len(tokenizer.sot_sequence)
    # row_ids[i] = the token whose probability row i reports (reference
    # computes these host-side from full logits, timing.py:191-198; same
    # softmax-over-text-vocab semantics)
    row_ids = np.zeros(PREFILL_LEN, dtype=np.int32)
    row_ids[sot_len : sot_len + len(text_tokens)] = text_tokens
    # fetched matrix rows are bucketed to multiples of 32 so the row-slice
    # jit cache holds at most 8 programs
    nb = min(PREFILL_LEN, ((n + 31) // 32) * 32)

    if _use_device_align():
        # one fused device program: prefill + alignment capture + token
        # probs + softmax/z-norm/median-filter matrix processing. Only (P,)
        # probs and (nb, 1500) f32 matrix rows cross the host boundary —
        # the raw per-head block is ~24 MB per window at 40 heads.
        tp, matrix_dev = model.alignment_replay(
            np.asarray([tokens], dtype=np.int32),
            n,
            ck,
            cv,
            row_ids,
            num_frames,
            tokenizer.eot,
            qk_scale=qk_scale,
            medfilt_width=medfilt_width,
        )
        probs = np.asarray(tp)
        matrix = np.asarray(matrix_dev[:nb]).astype(np.float64)
        matrix = matrix[sot_len : n - 1, : num_frames // 2]
    else:
        hidden, _, align = model.prefill_align(
            np.asarray([tokens], dtype=np.int32), n, ck, cv
        )
        probs = np.asarray(
            model.sampled_token_probs(hidden[0], row_ids, tokenizer.eot)
        )
        # (heads, tokens, frames) — fetch only the token rows the DTW needs
        weights = np.asarray(align[:, :nb, :]).astype(np.float64)[
            :, :n, : num_frames // 2
        ]
        weights = weights * qk_scale
        weights = np.exp(weights - weights.max(axis=-1, keepdims=True))
        weights = weights / weights.sum(axis=-1, keepdims=True)
        mean = weights.mean(axis=-2, keepdims=True)
        std = weights.std(axis=-2, keepdims=True)  # population std (ddof=0)
        weights = (weights - mean) / std
        weights = median_filter(weights, medfilt_width)

        matrix = weights.mean(axis=0)
        matrix = matrix[sot_len : n - 1]

    text_token_probs = probs[sot_len : sot_len + len(text_tokens)].tolist()
    text_indices, time_indices = dtw(-matrix)

    words, word_tokens = tokenizer.split_to_word_tokens(text_tokens + [tokenizer.eot])
    if len(word_tokens) <= 1:
        # a single EOT "word" produces float indices downstream; bail out
        return []
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        np.mean(text_token_probs[i:j])
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]

    return [
        WordTiming(word, tokens, start, end, probability)
        for word, tokens, start, end, probability in zip(
            words, word_tokens, start_times, end_times, word_probabilities
        )
    ]


def merge_punctuations(alignment: List[WordTiming], prepended: str, appended: str):
    # prepended punctuation joins the following word
    i = len(alignment) - 2
    j = len(alignment) - 1
    while i >= 0:
        previous = alignment[i]
        following = alignment[j]
        if previous.word.startswith(" ") and previous.word.strip() in prepended:
            following.word = previous.word + following.word
            following.tokens = previous.tokens + following.tokens
            previous.word = ""
            previous.tokens = []
        else:
            j = i
        i -= 1

    # appended punctuation joins the preceding word
    i = 0
    j = 1
    while j < len(alignment):
        previous = alignment[i]
        following = alignment[j]
        if not previous.word.endswith(" ") and following.word in appended:
            previous.word = previous.word + following.word
            previous.tokens = previous.tokens + following.tokens
            following.word = ""
            following.tokens = []
        else:
            i = j
        j += 1


def add_word_timestamps(
    *,
    segments: List[dict],
    model: "Whisper",
    tokenizer: Tokenizer,
    num_frames: int,
    ck,
    cv,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    last_speech_timestamp: float,
    **kwargs,
):
    if len(segments) == 0:
        return

    text_tokens_per_segment = [
        [token for token in segment["tokens"] if token < tokenizer.eot]
        for segment in segments
    ]

    text_tokens = [t for seg in text_tokens_per_segment for t in seg]
    alignment = find_alignment(
        model, tokenizer, text_tokens, num_frames, ck, cv, **kwargs
    )
    word_durations = np.array([t.end - t.start for t in alignment])
    word_durations = word_durations[word_durations.nonzero()]
    median_duration = np.median(word_durations) if len(word_durations) > 0 else 0.0
    median_duration = min(0.7, float(median_duration))
    max_duration = median_duration * 2

    # truncate overlong words at sentence boundaries
    if len(word_durations) > 0:
        sentence_end_marks = ".。!！?？"
        for i in range(1, len(alignment)):
            if alignment[i].end - alignment[i].start > max_duration:
                if alignment[i].word in sentence_end_marks:
                    alignment[i].end = alignment[i].start + max_duration
                elif alignment[i - 1].word in sentence_end_marks:
                    alignment[i].start = alignment[i].end - max_duration

    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    word_index = 0

    for segment, text_tokens in zip(segments, text_tokens_per_segment):
        saved_tokens = 0
        words = []

        while word_index < len(alignment) and saved_tokens < len(text_tokens):
            timing = alignment[word_index]
            if timing.word:
                words.append(
                    dict(
                        word=timing.word,
                        start=round(time_offset + timing.start, 2),
                        end=round(time_offset + timing.end, 2),
                        probability=timing.probability,
                    )
                )
            saved_tokens += len(timing.tokens)
            word_index += 1

        # truncate overlong words at segment boundaries
        if len(words) > 0:
            # the first word after a long pause shouldn't stretch across it
            if words[0]["end"] - last_speech_timestamp > median_duration * 4 and (
                words[0]["end"] - words[0]["start"] > max_duration
                or (
                    len(words) > 1
                    and words[1]["end"] - words[0]["start"] > max_duration * 2
                )
            ):
                if (
                    len(words) > 1
                    and words[1]["end"] - words[1]["start"] > max_duration
                ):
                    boundary = max(words[1]["end"] / 2, words[1]["end"] - max_duration)
                    words[0]["end"] = words[1]["start"] = boundary
                words[0]["start"] = max(0, words[0]["end"] - max_duration)

            # prefer segment-level start/end when the edge words are too long
            if (
                segment["start"] < words[0]["end"]
                and segment["start"] - 0.5 > words[0]["start"]
            ):
                words[0]["start"] = max(
                    0, min(words[0]["end"] - median_duration, segment["start"])
                )
            else:
                segment["start"] = words[0]["start"]

            if (
                segment["end"] > words[-1]["start"]
                and segment["end"] + 0.5 < words[-1]["end"]
            ):
                words[-1]["end"] = max(
                    words[-1]["start"] + median_duration, segment["end"]
                )
            else:
                segment["end"] = words[-1]["end"]

            last_speech_timestamp = segment["end"]

        segment["words"] = words
