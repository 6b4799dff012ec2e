"""Long-form transcription orchestrator.

Host-side control flow mirroring the reference
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

PROVENANCE: the window-control heuristics in this file — the seek-advance
rules, temperature-fallback gates, hallucination/silence skipping, and
anomaly scoring — are deliberately expressed close to the reference source
(/root/reference/whisper/transcribe.py:41-524, itself openai/whisper, MIT
license) because they ARE the parity contract: segment boundaries and seek
decisions must match token-for-token against the reference oracle
(tests/test_transcribe.py pins multi-window, clip-window, and
fallback-ladder behavior). Treat the reference file as the semantic spec
for every branch here; divergences are documented in PARITY.md.
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
    """Anomalous words are very long, very short, or improbable."""
    probability = word.get("probability", 0.0)
    duration = word["end"] - word["start"]
    score = 0.0
    if probability < 0.15:
        score += 1.0
    if duration < 0.133:
        score += (0.133 - duration) * 15
    if duration > 2.0:
        score += duration - 2.0
    return score


def _is_segment_anomaly(segment: Optional[dict]) -> bool:
    if segment is None or not segment["words"]:
        return False
    words = [w for w in segment["words"] if w["word"] not in _PUNCTUATION]
    words = words[:8]
    score = sum(_word_anomaly_score(w) for w in words)
    return score >= 3 or score + 0.01 >= len(words)


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
    pairs and compute the next seek position (the reference's segmentation +
    seek rules, transcribe.py:350-410). Returns
    (segments, new_seek, single_timestamp_ending)."""
    segments: List[dict] = []
    timestamp_tokens = tokens >= tokenizer.timestamp_begin
    single_timestamp_ending = timestamp_tokens[-2:].tolist() == [False, True]

    consecutive = np.where(timestamp_tokens[:-1] & timestamp_tokens[1:])[0] + 1
    if len(consecutive) > 0:
        # consecutive timestamp pairs delimit segments
        slices = consecutive.tolist()
        if single_timestamp_ending:
            slices.append(len(tokens))

        last_slice = 0
        for current_slice in slices:
            sliced_tokens = tokens[last_slice:current_slice]
            start_pos = int(sliced_tokens[0]) - tokenizer.timestamp_begin
            end_pos = int(sliced_tokens[-1]) - tokenizer.timestamp_begin
            segments.append(
                make_segment(
                    start=time_offset + start_pos * time_precision,
                    end=time_offset + end_pos * time_precision,
                    tokens=sliced_tokens,
                    result=result,
                )
            )
            last_slice = current_slice

        if single_timestamp_ending:
            # no speech after the last timestamp
            seek += segment_size
        else:
            # continue from the last complete timestamp
            last_pos = int(tokens[last_slice - 1]) - tokenizer.timestamp_begin
            seek += last_pos * input_stride
    else:
        duration = segment_size * 0.01  # frames are 10 ms
        timestamps = tokens[np.nonzero(timestamp_tokens)[0]]
        if len(timestamps) > 0 and int(timestamps[-1]) != tokenizer.timestamp_begin:
            last_pos = int(timestamps[-1]) - tokenizer.timestamp_begin
            duration = last_pos * time_precision

        segments.append(
            make_segment(
                start=time_offset,
                end=time_offset + duration,
                tokens=tokens,
                result=result,
            )
        )
        seek += segment_size

    return segments, seek, single_timestamp_ending


def segment_builder(tokenizer, seek: int):
    """The per-window segment-dict constructor shared by transcribe/batch/
    streaming (the reference's `new_segment` closure, transcribe.py:244-258)."""

    def make_segment(*, start: float, end: float, tokens, result: DecodingResult):
        tokens = [int(t) for t in tokens]
        text_tokens = [token for token in tokens if token < tokenizer.eot]
        return {
            "seek": seek,
            "start": start,
            "end": end,
            "text": tokenizer.decode(text_tokens),
            "tokens": tokens,
            "temperature": result.temperature,
            "avg_logprob": result.avg_logprob,
            "compression_ratio": result.compression_ratio,
            "no_speech_prob": result.no_speech_prob,
        }

    return make_segment


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

        def mel_window(seek: int, segment_size: int):
            return device_mel_window(mel, seek, segment_size)

    else:
        mel = log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES)
        content_frames = mel.shape[-1] - N_FRAMES

        def mel_window(seek: int, segment_size: int):
            return pad_or_trim(mel[:, seek : seek + segment_size], N_FRAMES).astype(
                np.float32
            )

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
            mel_segment = mel_window(0, N_FRAMES)
            _, probs = model.detect_language(mel_segment)
            decode_options["language"] = max(probs, key=probs.get)
            if verbose is not None:
                print(
                    f"Detected language: {LANGUAGES[decode_options['language']].title()}"
                )

    language: str = decode_options["language"]
    task: str = decode_options.get("task", "transcribe")
    tokenizer = get_tokenizer(
        model.is_multilingual,
        num_languages=model.num_languages,
        language=language,
        task=task,
    )

    if isinstance(clip_timestamps, str):
        clip_timestamps = [
            float(ts) for ts in (clip_timestamps.split(",") if clip_timestamps else [])
        ]
    seek_points: List[int] = [round(ts * FRAMES_PER_SECOND) for ts in clip_timestamps]
    if len(seek_points) == 0:
        seek_points.append(0)
    if len(seek_points) % 2 == 1:
        seek_points.append(content_frames)
    seek_clips: List[Tuple[int, int]] = list(zip(seek_points[::2], seek_points[1::2]))

    if word_timestamps and task == "translate":
        warnings.warn("Word-level timestamps on translations may not be reliable.")

    # let the word-timestamp replay reuse each window's decode-pass cross-K/V
    # (DecodingResult.cross_kv); without word timestamps the rows would only
    # pin HBM, so they stay off
    decode_options.setdefault("keep_cross_kv", bool(word_timestamps))

    def decode_with_fallback(segment: np.ndarray) -> DecodingResult:
        temperatures = (
            [temperature] if isinstance(temperature, (int, float)) else temperature
        )
        decode_result = None

        for t in temperatures:
            kwargs = {**decode_options}
            if t > 0:
                # disable beam search / patience when sampling
                kwargs.pop("beam_size", None)
                kwargs.pop("patience", None)
            else:
                kwargs.pop("best_of", None)

            options = DecodingOptions(**kwargs, temperature=t)
            decode_result = model.decode(segment, options)

            needs_fallback = False
            if (
                compression_ratio_threshold is not None
                and decode_result.compression_ratio > compression_ratio_threshold
            ):
                needs_fallback = True  # too repetitive
            if (
                logprob_threshold is not None
                and decode_result.avg_logprob < logprob_threshold
            ):
                needs_fallback = True  # average log probability too low
            if (
                no_speech_threshold is not None
                and decode_result.no_speech_prob > no_speech_threshold
                and logprob_threshold is not None
                and decode_result.avg_logprob < logprob_threshold
            ):
                needs_fallback = False  # silence
            if not needs_fallback:
                break

        return decode_result

    clip_idx = 0
    seek = seek_clips[clip_idx][0]
    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)  # mel frames / token: 2
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # 0.02 s per token
    all_tokens: List[int] = []
    all_segments: List[dict] = []
    prompt_reset_since = 0

    remaining_prompt_length = model.dims.n_text_ctx // 2 - 1
    if initial_prompt is not None:
        initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
        all_tokens.extend(initial_prompt_tokens)
        remaining_prompt_length -= len(initial_prompt_tokens)
    else:
        initial_prompt_tokens = []

    with tqdm.tqdm(
        total=content_frames, unit="frames", disable=verbose is not False
    ) as pbar:
        last_speech_timestamp = 0.0
        while clip_idx < len(seek_clips):
            seek_clip_start, seek_clip_end = seek_clips[clip_idx]
            if seek < seek_clip_start:
                seek = seek_clip_start
            if seek >= seek_clip_end:
                clip_idx += 1
                if clip_idx < len(seek_clips):
                    seek = seek_clips[clip_idx][0]
                continue
            time_offset = float(seek * HOP_LENGTH / SAMPLE_RATE)
            window_end_time = float((seek + N_FRAMES) * HOP_LENGTH / SAMPLE_RATE)
            segment_size = min(N_FRAMES, content_frames - seek, seek_clip_end - seek)
            segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE
            mel_segment = mel_window(seek, segment_size)

            # padding a sub-second tail out to 30 s causes hallucinations;
            # discard it (reference transcribe.py:292-297)
            if segment_duration < 1.0:
                clip_idx += 1
                continue

            if carry_initial_prompt:
                nignored = max(len(initial_prompt_tokens), prompt_reset_since)
                remaining_prompt = all_tokens[nignored:][-remaining_prompt_length:]
                decode_options["prompt"] = initial_prompt_tokens + remaining_prompt
            else:
                decode_options["prompt"] = all_tokens[prompt_reset_since:]

            result: DecodingResult = decode_with_fallback(mel_segment)
            tokens = np.array(result.tokens)

            if no_speech_threshold is not None:
                # voice-activity gate
                should_skip = result.no_speech_prob > no_speech_threshold
                if (
                    logprob_threshold is not None
                    and result.avg_logprob > logprob_threshold
                ):
                    should_skip = False
                if should_skip:
                    seek += segment_size
                    continue

            previous_seek = seek
            current_segments, seek, single_timestamp_ending = segments_from_tokens(
                tokens=tokens,
                tokenizer=tokenizer,
                result=result,
                seek=seek,
                segment_size=segment_size,
                time_offset=time_offset,
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
                    segments=current_segments,
                    model=model,
                    tokenizer=tokenizer,
                    num_frames=segment_size,
                    ck=ck,
                    cv=cv,
                    prepend_punctuations=prepend_punctuations,
                    append_punctuations=append_punctuations,
                    last_speech_timestamp=last_speech_timestamp,
                )

                if not single_timestamp_ending:
                    last_word_end = get_end(current_segments)
                    if last_word_end is not None and last_word_end > time_offset:
                        seek = round(last_word_end * FRAMES_PER_SECOND)

                # skip silence before possible hallucinations
                if hallucination_silence_threshold is not None:
                    threshold = hallucination_silence_threshold
                    if not single_timestamp_ending:
                        last_word_end = get_end(current_segments)
                        if last_word_end is not None and last_word_end > time_offset:
                            remaining_duration = window_end_time - last_word_end
                            if remaining_duration > threshold:
                                seek = round(last_word_end * FRAMES_PER_SECOND)
                            else:
                                seek = previous_seek + segment_size

                    # if the first segment might be a hallucination, skip
                    # leading silence
                    first_segment = _next_words_segment(current_segments)
                    if first_segment is not None and _is_segment_anomaly(first_segment):
                        gap = first_segment["start"] - time_offset
                        if gap > threshold:
                            seek = previous_seek + round(gap * FRAMES_PER_SECOND)
                            continue

                    # skip silence before any hallucination surrounded by
                    # silence or more hallucinations
                    hal_last_end = last_speech_timestamp
                    for si in range(len(current_segments)):
                        segment = current_segments[si]
                        if not segment["words"]:
                            continue
                        if _is_segment_anomaly(segment):
                            next_segment = _next_words_segment(
                                current_segments[si + 1 :]
                            )
                            if next_segment is not None:
                                hal_next_start = next_segment["words"][0]["start"]
                            else:
                                hal_next_start = time_offset + segment_duration
                            silence_before = (
                                segment["start"] - hal_last_end > threshold
                                or segment["start"] < threshold
                                or segment["start"] - time_offset < 2.0
                            )
                            silence_after = (
                                hal_next_start - segment["end"] > threshold
                                or _is_segment_anomaly(next_segment)
                                or window_end_time - segment["end"] < 2.0
                            )
                            if silence_before and silence_after:
                                seek = round(
                                    max(time_offset + 1, segment["start"])
                                    * FRAMES_PER_SECOND
                                )
                                if content_duration - segment["end"] < threshold:
                                    seek = content_frames
                                current_segments[si:] = []
                                break
                        hal_last_end = segment["end"]

                last_word_end = get_end(current_segments)
                if last_word_end is not None:
                    last_speech_timestamp = last_word_end

            if verbose:
                for segment in current_segments:
                    start, end, text = segment["start"], segment["end"], segment["text"]
                    line = f"[{format_timestamp(start)} --> {format_timestamp(end)}] {text}"
                    print(make_safe(line))

            # drop instantaneous or textless segments
            for i, segment in enumerate(current_segments):
                if segment["start"] == segment["end"] or segment["text"].strip() == "":
                    segment["text"] = ""
                    segment["tokens"] = []
                    segment["words"] = []

            all_segments.extend(
                [
                    {"id": i, **segment}
                    for i, segment in enumerate(
                        current_segments, start=len(all_segments)
                    )
                ]
            )
            all_tokens.extend(
                [token for segment in current_segments for token in segment["tokens"]]
            )

            if not condition_on_previous_text or result.temperature > 0.5:
                # don't condition on high-temperature output
                prompt_reset_since = len(all_tokens)

            pbar.update(min(content_frames, seek) - previous_seek)

    return dict(
        text=tokenizer.decode(all_tokens[len(initial_prompt_tokens) :]),
        segments=all_segments,
        language=language,
    )
