"""Multi-stream batched transcription (throughput / serving mode).

The reference processes multiple files strictly sequentially
(/root/reference/whisper/transcribe.py:626-638) because its compiled CoreML
graphs are fixed at batch 1 (beam batching aside). On TPU the batch dimension
is free: this module transcribes N independent audio streams concurrently by
stepping their 30-second windows in lockstep — one batched encoder pass and
one batched decoding loop per round serve every active stream, keeping the
MXU fed (SURVEY.md §2b "batched/multi-stream long-form on one chip").

Semantics per stream match `transcribe()` for the supported option subset
(greedy or beam, single temperature, word timestamps). Streams that fail a
quality gate fall back individually through the temperature ladder without
dragging the others. For the full option surface (clip_timestamps,
hallucination heuristics) use `transcribe()` per stream.
"""

from typing import List, Optional, Tuple, Union

import numpy as np

from .audio import HOP_LENGTH, N_FRAMES, N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram, pad_or_trim
from .decoding import DecodingOptions, DecodingResult, DecodingTask
from .tokenizer import get_tokenizer
from .transcribe import segment_builder, segments_from_tokens
from .utils import exact_div


class _Stream:
    def __init__(self, idx: int, mel: Optional[np.ndarray], content_frames: int):
        self.last_speech_timestamp = 0.0
        self.idx = idx
        self.mel = mel  # host mel; None when the mel lives on device
        self.device_mel = None  # per-stream device mel (continuous batcher)
        self.content_frames = content_frames
        self.seek = 0
        self.all_tokens: List[int] = []
        self.all_segments: List[dict] = []
        self.prompt_reset_since = 0

    @property
    def done(self) -> bool:
        # sub-second tails are discarded, as padding them to 30 s causes
        # hallucinations (reference transcribe.py:292-297)
        return self.content_frames - self.seek < SAMPLE_RATE // HOP_LENGTH


def _stream_result(model, s: "_Stream", language: str, task: str) -> dict:
    """A finished stream's transcribe()-schema result dict."""
    tokenizer = get_tokenizer(
        model.is_multilingual,
        num_languages=model.num_languages,
        language=language,
        task=task,
    )
    return dict(
        text=tokenizer.decode(s.all_tokens),
        segments=s.all_segments,
        language=language,
    )


# the temperature-ladder retry gates are transcribe()'s; one definition
# serves the sequential, batch, and continuous paths
from .transcribe import _quality_gates_failed as _needs_fallback  # noqa: E402


def _decode_window_batch(
    model, mels: np.ndarray, prompts, lang: str, t: float, task: str, decode_options
):
    """Decode one lockstep round's windows. Prompts differ per stream ->
    decode per unique prompt group; for the common serving case (no
    conditioning or fresh streams) this is one batched fused call.
    Heterogeneous prompts split the batch into variable-size groups, routed
    through the host loop so the fused engine (whose compiled graph is keyed
    on n_audio) doesn't recompile per group."""
    kwargs = dict(decode_options)
    if t > 0:
        kwargs.pop("beam_size", None)
        kwargs.pop("patience", None)
    else:
        kwargs.pop("best_of", None)
    results: List[Optional[DecodingResult]] = [None] * mels.shape[0]
    groups = {}
    for i, p in enumerate(prompts):
        groups.setdefault(tuple(p), []).append(i)
    fuse_ok = len(groups) == 1
    prev_fused = getattr(model, "use_fused_decode", True)
    model.use_fused_decode = prev_fused and fuse_ok
    try:
        for prompt, idxs in groups.items():
            opts = DecodingOptions(
                language=lang, task=task, temperature=t,
                prompt=list(prompt) or None, **kwargs
            )  # fmt: skip
            task_obj = DecodingTask(model, opts)
            out = task_obj.run(mels[np.asarray(idxs)])
            for i, r in zip(idxs, out):
                results[i] = r
    finally:
        model.use_fused_decode = prev_fused
    return results


def _apply_window_result(
    model,
    s: "_Stream",
    result: DecodingResult,
    *,
    language: str,
    task: str,
    no_speech_threshold,
    logprob_threshold,
    condition_on_previous_text: bool,
    word_timestamps: bool,
    prepend_punctuations: str,
    append_punctuations: str,
    input_stride: int,
    time_precision: float,
):
    """Apply one decoded window to a stream's state: no-speech skip, segment
    extraction, seek advance, prompt bookkeeping, optional word timestamps.
    The per-window subset of transcribe()'s loop (reference
    transcribe.py:309-426), shared by the lockstep batch transcriber and the
    continuous batcher (whisper_tpu/continuous.py)."""
    segment_size = min(N_FRAMES, s.content_frames - s.seek)
    time_offset = float(s.seek * HOP_LENGTH / SAMPLE_RATE)
    tokenizer = get_tokenizer(
        model.is_multilingual,
        num_languages=model.num_languages,
        language=language,
        task=task,
    )

    if no_speech_threshold is not None:
        should_skip = result.no_speech_prob > no_speech_threshold
        if logprob_threshold is not None and result.avg_logprob > logprob_threshold:
            should_skip = False
        if should_skip:
            s.seek += segment_size
            return

    segments, s.seek, single_timestamp_ending = segments_from_tokens(
        tokens=np.array(result.tokens),
        tokenizer=tokenizer,
        result=result,
        seek=s.seek,
        segment_size=segment_size,
        time_offset=time_offset,
        time_precision=time_precision,
        input_stride=input_stride,
        make_segment=segment_builder(tokenizer, s.seek),
    )

    if word_timestamps:
        from .timing import add_word_timestamps
        from .utils import get_end

        if result.cross_kv is not None:
            ck1, cv1 = result.cross_kv
        else:
            import jax.numpy as jnp

            ck1, cv1 = model.cross_kv(jnp.asarray(result.audio_features)[None])
        add_word_timestamps(
            segments=segments,
            model=model,
            tokenizer=tokenizer,
            num_frames=segment_size,
            ck=ck1,
            cv=cv1,
            prepend_punctuations=prepend_punctuations,
            append_punctuations=append_punctuations,
            last_speech_timestamp=s.last_speech_timestamp,
        )
        # transcribe.py's word-level seek rule: resume after the last
        # spoken word unless the window ended on a lone timestamp
        if not single_timestamp_ending:
            last_word_end = get_end(segments)
            if last_word_end is not None and last_word_end > time_offset:
                s.seek = round(last_word_end * (SAMPLE_RATE // HOP_LENGTH))
        last_word_end = get_end(segments)
        if last_word_end is not None:
            s.last_speech_timestamp = last_word_end

    for i, segment in enumerate(segments):
        if segment["start"] == segment["end"] or segment["text"].strip() == "":
            segment["text"] = ""
            segment["tokens"] = []

    s.all_segments.extend(
        {"id": i, **seg}
        for i, seg in enumerate(segments, start=len(s.all_segments))
    )
    s.all_tokens.extend(t for seg in segments for t in seg["tokens"])
    if not condition_on_previous_text or result.temperature > 0.5:
        s.prompt_reset_since = len(s.all_tokens)


def transcribe_batch(
    model,
    audios: List[Union[str, np.ndarray]],
    *,
    language: Optional[str] = None,
    task: str = "transcribe",
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'\u201c\u00bf([{-",
    append_punctuations: str = "\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001",
    verbose: Optional[bool] = None,
    **decode_options,
) -> List[dict]:
    """Transcribe N audio streams concurrently. Returns one result dict per
    stream (same schema as transcribe()).

    `verbose` is accepted for signature compatibility with transcribe()
    (callers routinely share one kwargs dict between the two); batched
    decoding interleaves streams, so there is no per-segment live log —
    it must not leak into DecodingOptions (TypeError)."""
    if language is None:
        language = "en" if not model.is_multilingual else None
    temperatures = (
        [temperature] if isinstance(temperature, (int, float)) else list(temperature)
    )
    # reuse each window's decode-pass cross-K/V in the word-timestamp replay;
    # off otherwise (the rows pin HBM for the result's lifetime)
    decode_options.setdefault("keep_cross_kv", bool(word_timestamps))

    # All streams' mels as ONE device block (one upload + one program) when
    # the device frontend is on; per-stream host numpy mel otherwise. Window
    # slicing then happens per round: one vmapped device program vs N host
    # slices + an upload (whisper_tpu/frontend.py owns both pieces).
    from .transcribe import _use_device_mel

    use_device_mel = _use_device_mel()
    streams = []
    device_mels = None
    if use_device_mel:
        from .audio import load_audio
        from .frontend import batched_device_mel, batched_mel_windows

        loaded = [
            load_audio(a) if isinstance(a, str) else np.asarray(a, np.float32)
            for a in audios
        ]
        device_mels, content_list = batched_device_mel(loaded, model.dims.n_mels)
        for i, cf in enumerate(content_list):
            streams.append(_Stream(i, None, cf))
    else:
        for i, audio in enumerate(audios):
            mel = log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES)
            streams.append(_Stream(i, mel, mel.shape[-1] - N_FRAMES))

    def stream_windows(seeks, sizes):
        """(B, n_mels, N_FRAMES) windows, one per stream, zero past size."""
        if use_device_mel:
            return batched_mel_windows(device_mels, seeks, sizes)
        rows = []
        for s, seek, size in zip(streams, seeks, sizes):
            if size <= 0:
                rows.append(np.zeros((s.mel.shape[0], N_FRAMES), np.float32))
            else:
                rows.append(
                    pad_or_trim(s.mel[:, seek : seek + size], N_FRAMES).astype(
                        np.float32
                    )
                )
        return np.stack(rows)

    # language detection on each stream's first window if needed
    if language is None:
        langs = []
        # full windows, no zero mask: short streams detect on their real
        # silence-mel padding exactly like the host path's mel[:, :N_FRAMES]
        first = stream_windows([0] * len(streams), [N_FRAMES] * len(streams))
        for i in range(len(streams)):
            _, probs = model.detect_language(first[i])
            langs.append(max(probs, key=probs.get))
        # heterogeneous languages are allowed; tokenizer is per-stream
        stream_language = langs
    else:
        stream_language = [language] * len(streams)

    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE

    def decode_batch(mels: np.ndarray, prompts, lang: str, t: float):
        return _decode_window_batch(model, mels, prompts, lang, t, task, decode_options)

    bookkeeping = dict(
        task=task,
        no_speech_threshold=no_speech_threshold,
        logprob_threshold=logprob_threshold,
        condition_on_previous_text=condition_on_previous_text,
        word_timestamps=word_timestamps,
        prepend_punctuations=prepend_punctuations,
        append_punctuations=append_punctuations,
        input_stride=input_stride,
        time_precision=time_precision,
    )

    while any(not s.done for s in streams):
        # keep EVERY stream in the batch so the compiled graph shapes stay
        # constant (finished streams decode a silent window whose result is
        # discarded); the fused engine is keyed on n_audio
        active = streams

        # stream windows and per-stream prompts (finished streams decode a
        # zero window whose result is discarded)
        seeks, sizes, prompts = [], [], []
        for s in active:
            if s.done:
                seeks.append(0)
                sizes.append(0)
                prompts.append([])
                continue
            seeks.append(s.seek)
            sizes.append(min(N_FRAMES, s.content_frames - s.seek))
            prompts.append(
                s.all_tokens[s.prompt_reset_since :]
                if condition_on_previous_text
                else []
            )
        mels = stream_windows(seeks, sizes)

        # batch by language (usually one group)
        lang_groups = {}
        for pos, s in enumerate(active):
            lang_groups.setdefault(stream_language[s.idx], []).append(pos)

        results: List[Optional[DecodingResult]] = [None] * len(active)
        for lang, positions in lang_groups.items():
            sub_results = decode_batch(
                mels[np.asarray(positions)],
                [prompts[p] for p in positions],
                lang,
                temperatures[0],
            )
            # per-stream temperature fallback for failed windows only
            for slot, r in zip(positions, sub_results):
                for t in temperatures[1:]:
                    if not _needs_fallback(
                        r,
                        compression_ratio_threshold,
                        logprob_threshold,
                        no_speech_threshold,
                    ):
                        break
                    r = decode_batch(
                        mels[slot : slot + 1], [prompts[slot]], lang, t
                    )[0]
                results[slot] = r

        # window bookkeeping per stream
        for s, result in zip(active, results):
            if s.done:
                continue
            _apply_window_result(
                model, s, result, language=stream_language[s.idx], **bookkeeping
            )

    return [
        _stream_result(model, s, stream_language[s.idx], task) for s in streams
    ]


def transcribe_chunked(
    model,
    audio: Union[str, np.ndarray],
    *,
    chunk_seconds: int = 30,
    **kwargs,
) -> dict:
    """Chunked transcription of ONE long audio: split at fixed boundaries and
    decode every chunk concurrently as one batch (transcribe_batch), then
    merge with time offsets. Latency for a long file approaches the
    multi-stream aggregate rate instead of windows x sequential decode.

    This is the batched "chunked" mode popularized by the HF pipeline /
    faster-whisper (the reference has no equivalent — it is strictly
    sequential, transcribe.py:626-638). The fixed boundaries mean no
    cross-chunk conditioning and a word can straddle a boundary; for
    maximum-fidelity output use transcribe().
    """
    from .audio import load_audio

    if isinstance(audio, str):
        audio = load_audio(audio)
    audio = np.asarray(audio, dtype=np.float32)
    chunk = chunk_seconds * SAMPLE_RATE
    n_chunks = max(1, -(-len(audio) // chunk))
    chunks = [audio[i * chunk : (i + 1) * chunk] for i in range(n_chunks)]

    kwargs.setdefault("condition_on_previous_text", False)
    results = transcribe_batch(model, chunks, **kwargs)

    segments, idx = [], 0
    for i, r in enumerate(results):
        off = i * chunk_seconds
        for seg in r["segments"]:
            seg = dict(seg)
            seg["id"] = idx
            seg["start"] += off
            seg["end"] += off
            seg["seek"] += i * (chunk // HOP_LENGTH)
            segments.append(seg)
            idx += 1
    return dict(
        text="".join(r["text"] for r in results),
        segments=segments,
        language=results[0]["language"] if results else None,
    )
