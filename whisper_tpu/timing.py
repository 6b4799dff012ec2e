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
is original TPU code. The word-merge / duration-clamp heuristics
(punctuation merging, median-duration caps, pause-boundary snapping) are
this repo's own expression of the reference's semantics
(/root/reference/whisper/timing.py:234-377, itself openai/whisper, MIT
license) — word-boundary placement is a golden-pinned parity contract
(tests/test_transcribe.py word-timing assertions), so each helper cites the
reference range that serves as its spec.
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


def _absorb(donor: WordTiming, keeper: WordTiming, donor_first: bool) -> None:
    """Fold `donor`'s text+tokens into `keeper` (order per donor_first) and
    blank the donor — blanked entries keep their slot so token bookkeeping
    in add_word_timestamps still walks the original alignment."""
    if donor_first:
        keeper.word = donor.word + keeper.word
        keeper.tokens = donor.tokens + keeper.tokens
    else:
        keeper.word = keeper.word + donor.word
        keeper.tokens = keeper.tokens + donor.tokens
    donor.word = ""
    donor.tokens = []


def merge_punctuations(alignment: List[WordTiming], prepended: str, appended: str):
    """Attach punctuation 'words' to their neighbors (spec: reference
    timing.py:234-265): opening marks (a leading-space word in `prepended`)
    fold into the word after them; closing marks (in `appended`, when the
    word before doesn't end in a space) fold into the word before."""
    # right-to-left: each opening mark joins the nearest surviving follower
    anchor = len(alignment) - 1
    for k in range(len(alignment) - 2, -1, -1):
        cand = alignment[k]
        if cand.word.startswith(" ") and cand.word.strip() in prepended:
            _absorb(cand, alignment[anchor], donor_first=True)
        else:
            anchor = k

    # left-to-right: each closing mark joins the nearest surviving leader
    anchor = 0
    for k in range(1, len(alignment)):
        cand = alignment[k]
        if not alignment[anchor].word.endswith(" ") and cand.word in appended:
            _absorb(cand, alignment[anchor], donor_first=False)
        else:
            anchor = k


_SENTENCE_MARKS = ".。!！?？"


def _typical_and_cap_durations(alignment: List[WordTiming]) -> tuple:
    """(typical_s, cap_s): the median nonzero word span clipped to 0.7 s,
    and the 2x cap the clamp heuristics treat as 'too long' (spec:
    reference timing.py:305-310)."""
    spans = np.array([w.end - w.start for w in alignment])
    spans = spans[spans.nonzero()]
    typical_s = float(np.median(spans)) if len(spans) else 0.0
    typical_s = min(0.7, typical_s)
    return typical_s, 2 * typical_s, len(spans) > 0


def _clamp_at_sentence_marks(alignment: List[WordTiming], cap_s: float) -> None:
    """An overlong word touching a sentence boundary gets clipped to the
    cap: a long PERIOD shrinks forward from its start; a long word right
    AFTER a period shrinks backward from its end."""
    for k in range(1, len(alignment)):
        w = alignment[k]
        if w.end - w.start <= cap_s:
            continue
        if w.word in _SENTENCE_MARKS:
            w.end = w.start + cap_s
        elif alignment[k - 1].word in _SENTENCE_MARKS:
            w.start = w.end - cap_s


def _clamp_after_pause(
    words: List[dict], pause_started: float, typical_s: float, cap_s: float
) -> None:
    """A segment's first word shouldn't stretch back across a long pause
    (spec: reference timing.py:344-357): when the gap since the last speech
    exceeds 4x the typical span AND the opening word (or opening pair) is
    overlong, pull its start in — rebalancing against an overlong second
    word first."""
    opener = words[0]
    if opener["end"] - pause_started <= typical_s * 4:
        return
    pair_overlong = (
        len(words) > 1 and words[1]["end"] - opener["start"] > cap_s * 2
    )
    if not (opener["end"] - opener["start"] > cap_s or pair_overlong):
        return
    if len(words) > 1 and words[1]["end"] - words[1]["start"] > cap_s:
        split = max(words[1]["end"] / 2, words[1]["end"] - cap_s)
        opener["end"] = words[1]["start"] = split
    opener["start"] = max(0, opener["end"] - cap_s)


def _snap_segment_edges(segment: dict, words: List[dict], typical_s: float) -> None:
    """Reconcile word-edge times with the segment's timestamp-token times
    (spec: reference timing.py:359-374): trust the segment time when the
    edge word overshoots it by more than half a second, otherwise move the
    segment time onto the word."""
    opener, closer = words[0], words[-1]
    if segment["start"] < opener["end"] and segment["start"] - 0.5 > opener["start"]:
        opener["start"] = max(0, min(opener["end"] - typical_s, segment["start"]))
    else:
        segment["start"] = opener["start"]
    if segment["end"] > closer["start"] and segment["end"] + 0.5 < closer["end"]:
        closer["end"] = max(closer["start"] + typical_s, segment["end"])
    else:
        segment["end"] = closer["end"]


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

    spoken_per_segment = [
        [t for t in seg["tokens"] if t < tokenizer.eot] for seg in segments
    ]
    alignment = find_alignment(
        model,
        tokenizer,
        [t for seg in spoken_per_segment for t in seg],
        num_frames,
        ck,
        cv,
        **kwargs,
    )

    typical_s, cap_s, have_spans = _typical_and_cap_durations(alignment)
    if have_spans:
        _clamp_at_sentence_marks(alignment, cap_s)
    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    window_t0 = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    cursor = 0  # alignment entries consumed so far

    for segment, spoken in zip(segments, spoken_per_segment):
        consumed = 0
        words: List[dict] = []
        # hand each segment exactly its own tokens' worth of alignment
        # entries; punctuation-blanked entries spend tokens but emit nothing
        while cursor < len(alignment) and consumed < len(spoken):
            entry = alignment[cursor]
            if entry.word:
                words.append(
                    dict(
                        word=entry.word,
                        start=round(window_t0 + entry.start, 2),
                        end=round(window_t0 + entry.end, 2),
                        probability=entry.probability,
                    )
                )
            consumed += len(entry.tokens)
            cursor += 1

        if words:
            _clamp_after_pause(words, last_speech_timestamp, typical_s, cap_s)
            _snap_segment_edges(segment, words, typical_s)
            last_speech_timestamp = segment["end"]

        segment["words"] = words
