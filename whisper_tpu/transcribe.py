"""Long-form transcription orchestrator.

Host-side control flow with the same window semantics as the reference
(/root/reference/whisper/transcribe.py:41-524): one mel computed for the full
audio plus 30 s of zero padding, 30-second windows advanced by decoded
timestamp tokens (or word-end times), a temperature-fallback ladder gated on
compression ratio / avg logprob, no-speech skipping, prompt conditioning with
`condition_on_previous_text` / `carry_initial_prompt`, sub-second tail
discard, and the word-timestamp hallucination/silence heuristics.

Only the inner token loop and the model graphs run on the TPU; this
window-level control flow is sequential, data-dependent, and cheap, so it
stays in Python by design (SURVEY.md §7 "dynamic control flow at window
level").

PROVENANCE: the reference file above (itself openai/whisper, MIT license) is
the semantic SPEC for every branch here — seek-advance rules, fallback
gates, hallucination/silence skipping, anomaly scoring — because they ARE
the parity contract: segment boundaries and seek decisions must match the
reference oracle decision-for-decision (tests/test_transcribe.py and
tests/test_longform_adversarial.py pin multi-window, clip-window,
fallback-ladder, and silence-skip behavior). The code is this repo's own
expression of that spec; divergences are documented in PARITY.md.
"""

import warnings
from typing import TYPE_CHECKING, List, Optional, Tuple, Union

import numpy as np
import tqdm

from .audio import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from .decoding import DecodingOptions, DecodingResult
from .timing import add_word_timestamps
from .tokenizer import LANGUAGES, get_tokenizer
from .utils import exact_div, format_timestamp, get_end, make_safe

if TYPE_CHECKING:
    from .models.whisper import Whisper

_PUNCTUATION = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"

# anomaly-score constants (spec: reference transcribe.py:327-345). A word
# contributes penalty for being improbable, too brief, or too drawn out.
_ANOMALY_MIN_PROB = 0.15
_ANOMALY_SHORT_S = 0.133
_ANOMALY_SHORT_RATE = 15.0
_ANOMALY_LONG_S = 2.0
_ANOMALY_SCORE_LIMIT = 3.0
_ANOMALY_HEAD_WORDS = 8


def _use_device_mel() -> bool:
    """Device mel on TPU by default; WHISPER_TPU_DEVICE_MEL=0/1 overrides.
    CPU keeps the host numpy mel (it's faster there and bit-stable vs the
    fp32 oracle parity tests)."""
    import os

    env = os.environ.get("WHISPER_TPU_DEVICE_MEL", "")
    if env in ("0", "1"):
        return env == "1"
    import jax

    return jax.default_backend() == "tpu"


def _word_anomaly_score(word: dict) -> float:
    """Penalty for one word: improbable, too brief, or too drawn out."""
    length_s = word["end"] - word["start"]
    penalty = 1.0 if word.get("probability", 0.0) < _ANOMALY_MIN_PROB else 0.0
    if length_s < _ANOMALY_SHORT_S:
        penalty += _ANOMALY_SHORT_RATE * (_ANOMALY_SHORT_S - length_s)
    if length_s > _ANOMALY_LONG_S:
        penalty += length_s - _ANOMALY_LONG_S
    return penalty


def _is_segment_anomaly(segment: Optional[dict]) -> bool:
    """A segment is anomalous when its leading non-punctuation words score
    past the absolute limit or average ~1 penalty point per word."""
    if segment is None or not segment["words"]:
        return False
    scored = [w for w in segment["words"] if w["word"] not in _PUNCTUATION]
    scored = scored[:_ANOMALY_HEAD_WORDS]
    total = sum(_word_anomaly_score(w) for w in scored)
    return total >= _ANOMALY_SCORE_LIMIT or total + 0.01 >= len(scored)


def _next_words_segment(segments: List[dict]) -> Optional[dict]:
    return next((s for s in segments if s["words"]), None)


def segments_from_tokens(
    *,
    tokens: np.ndarray,
    tokenizer,
    result: DecodingResult,
    seek: int,
    segment_size: int,
    time_offset: float,
    time_precision: float,
    input_stride: int,
    make_segment,
) -> Tuple[List[dict], int, bool]:
    """Slice a window's decoded tokens into segments using timestamp-token
    pairs and compute the next seek position (spec: reference
    transcribe.py:350-410). Returns (segments, new_seek,
    single_timestamp_ending)."""
    segments: List[dict] = []
    is_ts = tokens >= tokenizer.timestamp_begin
    # a lone timestamp right after text at the very end of the window
    lone_final_ts = bool(len(is_ts) >= 2 and not is_ts[-2] and is_ts[-1])

    def ts_seconds(token) -> float:
        return (int(token) - tokenizer.timestamp_begin) * time_precision

    # boundaries sit AFTER the first token of every adjacent timestamp pair
    pair_ends = (np.flatnonzero(is_ts[:-1] & is_ts[1:]) + 1).tolist()
    if pair_ends:
        if lone_final_ts:
            pair_ends = pair_ends + [len(tokens)]
        bounds = [0] + pair_ends
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            piece = tokens[lo:hi]
            segments.append(
                make_segment(
                    start=time_offset + ts_seconds(piece[0]),
                    end=time_offset + ts_seconds(piece[-1]),
                    tokens=piece,
                    result=result,
                )
            )
        if lone_final_ts:
            # nothing was spoken past the final timestamp: consume the window
            seek += segment_size
        else:
            # resume right at the last paired timestamp
            final_ts = int(tokens[bounds[-1] - 1]) - tokenizer.timestamp_begin
            seek += final_ts * input_stride
    else:
        # no pair anywhere: the whole window is one segment whose duration
        # comes from the last usable timestamp when one exists
        span_s = segment_size * 0.01  # 10 ms mel frames
        ts_tokens = tokens[np.flatnonzero(is_ts)]
        if len(ts_tokens) and int(ts_tokens[-1]) != tokenizer.timestamp_begin:
            span_s = ts_seconds(ts_tokens[-1])
        segments.append(
            make_segment(
                start=time_offset,
                end=time_offset + span_s,
                tokens=tokens,
                result=result,
            )
        )
        seek += segment_size

    return segments, seek, lone_final_ts


def segment_builder(tokenizer, seek: int):
    """The per-window segment-dict constructor shared by transcribe/batch/
    streaming (the reference's `new_segment` closure, transcribe.py:244-258)."""

    def make_segment(*, start: float, end: float, tokens, result: DecodingResult):
        tokens = [int(t) for t in tokens]
        spoken = [t for t in tokens if t < tokenizer.eot]
        return dict(
            seek=seek,
            start=start,
            end=end,
            text=tokenizer.decode(spoken),
            tokens=tokens,
            temperature=result.temperature,
            avg_logprob=result.avg_logprob,
            compression_ratio=result.compression_ratio,
            no_speech_prob=result.no_speech_prob,
        )

    return make_segment


def _quality_gates_failed(
    result: DecodingResult,
    compression_ratio_threshold: Optional[float],
    logprob_threshold: Optional[float],
    no_speech_threshold: Optional[float],
) -> bool:
    """Should the fallback ladder retry this window at a higher temperature?
    (spec: reference transcribe.py:206-223). Repetitive text or low average
    logprob fails the gates — unless the window also looks like silence, in
    which case the no-speech skip will handle it and retrying is pointless."""
    too_repetitive = (
        compression_ratio_threshold is not None
        and result.compression_ratio > compression_ratio_threshold
    )
    too_unlikely = (
        logprob_threshold is not None and result.avg_logprob < logprob_threshold
    )
    looks_silent = (
        no_speech_threshold is not None
        and result.no_speech_prob > no_speech_threshold
        and too_unlikely
    )
    if looks_silent:
        return False
    return too_repetitive or too_unlikely


def _silence_skip_pass(
    *,
    window_segments: List[dict],
    seek: int,
    seek_before: int,
    window_frames: int,
    window_t0: float,
    window_t1: float,
    window_seconds: float,
    content_frames: int,
    content_duration: float,
    threshold: float,
    lone_final_ts: bool,
    hal_last_end: float,
) -> Tuple[int, bool]:
    """The hallucination/silence seek heuristics (spec: reference
    transcribe.py:427-481), applied after word timestamps exist. May trim
    `window_segments` in place. Returns (seek, restart_window): when
    restart_window is True the caller re-decodes from the returned seek
    without emitting anything (the leading-silence skip)."""
    # trailing silence: if real speech ended well before the window does,
    # resume right after it; otherwise consume the window as decoded
    if not lone_final_ts:
        spoken_until = get_end(window_segments)
        if spoken_until is not None and spoken_until > window_t0:
            if window_t1 - spoken_until > threshold:
                seek = round(spoken_until * FRAMES_PER_SECOND)
            else:
                seek = seek_before + window_frames

    # leading silence: an anomalous FIRST segment after a gap is likely a
    # hallucination over silence — jump the gap and re-decode
    opener = _next_words_segment(window_segments)
    if opener is not None and _is_segment_anomaly(opener):
        gap_s = opener["start"] - window_t0
        if gap_s > threshold:
            return seek_before + round(gap_s * FRAMES_PER_SECOND), True

    # interior: drop any anomalous segment that silence (or more anomalies)
    # surrounds, and resume just before it
    for idx, seg in enumerate(window_segments):
        if not seg["words"]:
            continue
        if _is_segment_anomaly(seg):
            follower = _next_words_segment(window_segments[idx + 1 :])
            follower_start = (
                follower["words"][0]["start"]
                if follower is not None
                else window_t0 + window_seconds
            )
            quiet_before = (
                seg["start"] - hal_last_end > threshold
                or seg["start"] < threshold
                or seg["start"] - window_t0 < 2.0
            )
            quiet_after = (
                follower_start - seg["end"] > threshold
                or _is_segment_anomaly(follower)
                or window_t1 - seg["end"] < 2.0
            )
            if quiet_before and quiet_after:
                seek = round(
                    max(window_t0 + 1, seg["start"]) * FRAMES_PER_SECOND
                )
                if content_duration - seg["end"] < threshold:
                    seek = content_frames
                del window_segments[idx:]
                break
        hal_last_end = seg["end"]
    return seek, False


def transcribe(
    model: "Whisper",
    audio: Union[str, np.ndarray],
    *,
    verbose: Optional[bool] = None,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    carry_initial_prompt: bool = False,
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    clip_timestamps: Union[str, List[float]] = "0",
    hallucination_silence_threshold: Optional[float] = None,
    **decode_options,
) -> dict:
    """Transcribe audio (path or 16 kHz waveform). Returns a dict with
    "text", "segments" (each with timing + quality metrics, and "words" when
    word_timestamps=True), and "language"."""

    # one mel for the whole file, padded with 30 s of silence for slicing.
    # On TPU the mel lives on device (MXU DFT matmul) and windows are sliced
    # by a jitted dynamic_slice, so per-window features never cross the host
    # boundary; elsewhere (or with WHISPER_TPU_DEVICE_MEL=0) the host numpy
    # mel is used. Both share one semantics contract (tests/test_audio.py).
    if isinstance(audio, str):
        from .audio import load_audio

        audio = load_audio(audio)
    audio = np.asarray(audio, dtype=np.float32)

    if _use_device_mel():
        from .ops.stft import device_mel_full, device_mel_window

        mel, content_frames = device_mel_full(audio, model.dims.n_mels)

        def mel_window(seek: int, window_frames: int):
            return device_mel_window(mel, seek, window_frames)

    else:
        mel = log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES)
        content_frames = mel.shape[-1] - N_FRAMES

        def mel_window(seek: int, window_frames: int):
            sliced = mel[:, seek : seek + window_frames]
            return pad_or_trim(sliced, N_FRAMES).astype(np.float32)

    content_duration = float(content_frames * HOP_LENGTH / SAMPLE_RATE)

    if decode_options.get("language", None) is None:
        if not model.is_multilingual:
            decode_options["language"] = "en"
        else:
            if verbose:
                print(
                    "Detecting language using up to the first 30 seconds. "
                    "Use `--language` to specify the language"
                )
            _, lang_probs = model.detect_language(mel_window(0, N_FRAMES))
            decode_options["language"] = max(lang_probs, key=lang_probs.get)
            if verbose is not None:
                detected = LANGUAGES[decode_options["language"]].title()
                print(f"Detected language: {detected}")

    language: str = decode_options["language"]
    task: str = decode_options.get("task", "transcribe")
    tokenizer = get_tokenizer(
        model.is_multilingual,
        num_languages=model.num_languages,
        language=language,
        task=task,
    )

    # "start[,end[,start,end...]]" clip spec -> [(start_frame, end_frame)];
    # an unpaired final start runs to the end of the audio
    if isinstance(clip_timestamps, str):
        clip_timestamps = [
            float(t) for t in (clip_timestamps.split(",") if clip_timestamps else [])
        ]
    clip_frames = [round(t * FRAMES_PER_SECOND) for t in clip_timestamps] or [0]
    if len(clip_frames) % 2:
        clip_frames = clip_frames + [content_frames]
    seek_clips: List[Tuple[int, int]] = list(
        zip(clip_frames[0::2], clip_frames[1::2])
    )

    if word_timestamps and task == "translate":
        warnings.warn("Word-level timestamps on translations may not be reliable.")

    # let the word-timestamp replay reuse each window's decode-pass cross-K/V
    # (DecodingResult.cross_kv); without word timestamps the rows would only
    # pin HBM, so they stay off
    decode_options.setdefault("keep_cross_kv", bool(word_timestamps))

    ladder = [temperature] if isinstance(temperature, (int, float)) else temperature

    def decode_with_fallback(window_features) -> DecodingResult:
        """Climb the temperature ladder until the quality gates pass
        (spec: reference transcribe.py:188-228)."""
        result = None
        for temp in ladder:
            attempt = dict(decode_options, temperature=temp)
            if temp > 0:
                # sampling replaces beam search entirely
                attempt.pop("beam_size", None)
                attempt.pop("patience", None)
            else:
                attempt.pop("best_of", None)
            result = model.decode(window_features, DecodingOptions(**attempt))
            if not _quality_gates_failed(
                result,
                compression_ratio_threshold,
                logprob_threshold,
                no_speech_threshold,
            ):
                break
        return result

    clip_idx = 0
    seek = seek_clips[clip_idx][0]
    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)  # mel frames / token: 2
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # 0.02 s per token
    all_tokens: List[int] = []
    all_segments: List[dict] = []
    prompt_reset_since = 0

    prompt_budget = model.dims.n_text_ctx // 2 - 1
    initial_prompt_tokens: List[int] = []
    if initial_prompt is not None:
        initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
        all_tokens.extend(initial_prompt_tokens)
        prompt_budget -= len(initial_prompt_tokens)

    with tqdm.tqdm(
        total=content_frames, unit="frames", disable=verbose is not False
    ) as pbar:
        last_speech_timestamp = 0.0
        while clip_idx < len(seek_clips):
            clip_start, clip_end = seek_clips[clip_idx]
            seek = max(seek, clip_start)
            if seek >= clip_end:
                clip_idx += 1
                if clip_idx < len(seek_clips):
                    seek = seek_clips[clip_idx][0]
                continue
            window_t0 = float(seek * HOP_LENGTH / SAMPLE_RATE)
            window_t1 = float((seek + N_FRAMES) * HOP_LENGTH / SAMPLE_RATE)
            window_frames = min(N_FRAMES, content_frames - seek, clip_end - seek)
            window_seconds = window_frames * HOP_LENGTH / SAMPLE_RATE
            window_features = mel_window(seek, window_frames)

            # padding a sub-second tail out to 30 s causes hallucinations;
            # discard it (spec: reference transcribe.py:292-297)
            if window_seconds < 1.0:
                clip_idx += 1
                continue

            if carry_initial_prompt:
                skip = max(len(initial_prompt_tokens), prompt_reset_since)
                carried = all_tokens[skip:][-prompt_budget:]
                decode_options["prompt"] = initial_prompt_tokens + carried
            else:
                decode_options["prompt"] = all_tokens[prompt_reset_since:]

            result: DecodingResult = decode_with_fallback(window_features)
            tokens = np.array(result.tokens)

            if no_speech_threshold is not None:
                # voice-activity gate: confident no-speech skips the window,
                # unless the text itself scores confidently
                gated = result.no_speech_prob > no_speech_threshold
                if (
                    logprob_threshold is not None
                    and result.avg_logprob > logprob_threshold
                ):
                    gated = False
                if gated:
                    seek += window_frames
                    continue

            seek_before = seek
            window_segments, seek, lone_final_ts = segments_from_tokens(
                tokens=tokens,
                tokenizer=tokenizer,
                result=result,
                seek=seek,
                segment_size=window_frames,
                time_offset=window_t0,
                time_precision=time_precision,
                input_stride=input_stride,
                make_segment=segment_builder(tokenizer, seek),
            )

            if word_timestamps:
                if result.cross_kv is not None:
                    ck, cv = result.cross_kv
                else:
                    import jax.numpy as jnp

                    ck, cv = model.cross_kv(
                        jnp.asarray(result.audio_features)[None]
                    )
                add_word_timestamps(
                    segments=window_segments,
                    model=model,
                    tokenizer=tokenizer,
                    num_frames=window_frames,
                    ck=ck,
                    cv=cv,
                    prepend_punctuations=prepend_punctuations,
                    append_punctuations=append_punctuations,
                    last_speech_timestamp=last_speech_timestamp,
                )

                # word-end seek: trust word times over the window size when
                # the decode didn't end on a lone timestamp
                if not lone_final_ts:
                    spoken_until = get_end(window_segments)
                    if spoken_until is not None and spoken_until > window_t0:
                        seek = round(spoken_until * FRAMES_PER_SECOND)

                if hallucination_silence_threshold is not None:
                    seek, restart_window = _silence_skip_pass(
                        window_segments=window_segments,
                        seek=seek,
                        seek_before=seek_before,
                        window_frames=window_frames,
                        window_t0=window_t0,
                        window_t1=window_t1,
                        window_seconds=window_seconds,
                        content_frames=content_frames,
                        content_duration=content_duration,
                        threshold=hallucination_silence_threshold,
                        lone_final_ts=lone_final_ts,
                        hal_last_end=last_speech_timestamp,
                    )
                    if restart_window:
                        continue

                spoken_until = get_end(window_segments)
                if spoken_until is not None:
                    last_speech_timestamp = spoken_until

            if verbose:
                for seg in window_segments:
                    stamp = (
                        f"[{format_timestamp(seg['start'])} --> "
                        f"{format_timestamp(seg['end'])}] {seg['text']}"
                    )
                    print(make_safe(stamp))

            # blank out instantaneous or textless segments
            for seg in window_segments:
                if seg["start"] == seg["end"] or seg["text"].strip() == "":
                    seg["text"] = ""
                    seg["tokens"] = []
                    seg["words"] = []

            all_segments.extend(
                {"id": i, **seg}
                for i, seg in enumerate(window_segments, start=len(all_segments))
            )
            all_tokens.extend(t for seg in window_segments for t in seg["tokens"])

            if not condition_on_previous_text or result.temperature > 0.5:
                # don't condition on high-temperature output
                prompt_reset_since = len(all_tokens)

            pbar.update(min(content_frames, seek) - seek_before)

    return dict(
        text=tokenizer.decode(all_tokens[len(initial_prompt_tokens) :]),
        segments=all_segments,
        language=language,
    )
