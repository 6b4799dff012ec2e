"""Incremental (streaming) transcription.

The reference is strictly batch: `transcribe()` requires the full audio up
front (/root/reference/whisper/transcribe.py:41-143). This module accepts
audio in arbitrary-size chunks and emits finalized segments as soon as a full
30-second window is available, reusing the same windowed decode semantics
(temperature-fallback ladder, no-speech skip, timestamp-based seek, prompt
conditioning):

    st = StreamingTranscriber(model, language="en")
    for chunk in pcm_chunks:           # float32 @ 16 kHz, any length
        for seg in st.feed(chunk):
            print(seg["text"])
    for seg in st.flush():             # decode the final partial window
        print(seg["text"])

Mel windows are computed over only the undecoded tail (with a 2-frame
margin that makes them bit-identical to a whole-stream mel), and consumed
audio is trimmed, so per-window cost and memory stay O(30 s) regardless of
stream age — yet a stream fed in chunks produces the same segments as
`transcribe()` on the concatenated audio (pinned in tests for the supported
option subset: everything except clip_timestamps, which names absolute
file positions and has no live-stream meaning — use transcribe() for it).

`word_timestamps=True` attaches per-word times to FINAL segments via the
same alignment replay the batch path uses, including its word-end seek rule,
so finals match `transcribe(word_timestamps=True)` (partials stay word-free:
they are latency-critical advisories). `hallucination_silence_threshold`
composes with it (the batch silence-skip pass runs per finalized window;
see the __init__ note for the one causality caveat). `language=None` on a
multilingual model auto-detects on the first finalized window — the same
window batch `transcribe(language=None)` detects on — then pins it; pre-pin
partials detect provisionally per window.

Low-latency PARTIAL results: pass `partial_hop_s` (e.g. 1.0) and feed()
additionally emits advisory segments for the still-open window — the
available audio is padded to a full 30 s window and decoded NOW, without
waiting for the window to fill. Partials carry `"partial": True`, are
superseded by every later emission for the same region, and never touch the
stream's state (seek, prompt tokens, finalized segments), so the FINAL
output remains bit-identical to `transcribe()` on the concatenated audio.
`partial()` runs one such decode on demand.
"""

from typing import List, Optional

import numpy as np

from .audio import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    pad_or_trim,
)
from .ops.stft import log_mel_raw_np, normalize_log_mel
from .decoding import DecodingOptions, DecodingResult
from .tokenizer import get_tokenizer
from .transcribe import _silence_skip_pass, segment_builder, segments_from_tokens
from .utils import exact_div, get_end


class StreamingTranscriber:
    """Stateful incremental transcriber over one audio stream."""

    def __init__(
        self,
        model,
        *,
        language: Optional[str] = None,
        task: str = "transcribe",
        temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        condition_on_previous_text: bool = True,
        partial_hop_s: Optional[float] = None,
        word_timestamps: bool = False,
        prepend_punctuations: str = "\"'“¿([{-",
        append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
        hallucination_silence_threshold: Optional[float] = None,
        verbose: Optional[bool] = None,  # transcribe() signature compat;
        # streaming emits segments via feed()/flush(), not a live log
        **decode_options,
    ):
        self.model = model
        if language is None and not model.is_multilingual:
            language = "en"
        # language=None on a multilingual model: auto-detect on the FIRST
        # decoded window (batch semantics, transcribe.py detects on
        # mel_window(0, N_FRAMES)) and pin it for the rest of the stream.
        # Until then partials use a provisional per-window detection.
        self.language = language
        self.task = task
        self.temperatures = (
            [temperature] if isinstance(temperature, (int, float)) else list(temperature)
        )
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        self.condition_on_previous_text = condition_on_previous_text
        self.word_timestamps = word_timestamps
        self.prepend_punctuations = prepend_punctuations
        self.append_punctuations = append_punctuations
        # active only with word_timestamps, like batch transcribe. One
        # causality caveat: the batch tail rule compares an anomaly's end
        # against the WHOLE file's duration; a live stream only knows it at
        # flush, so windows finalized mid-stream treat the remaining audio
        # as unbounded (identical decisions unless the stream happens to
        # end within `threshold` seconds of a mid-stream window boundary
        # that carries a culled trailing anomaly).
        self.hallucination_silence_threshold = hallucination_silence_threshold
        self.decode_options = dict(decode_options)
        if word_timestamps:
            # let the alignment replay reuse each window's decode-pass
            # cross-K/V instead of recomputing it (batch transcribe.py:384)
            self.decode_options.setdefault("keep_cross_kv", True)
        self._last_speech_ts = 0.0

        self.tokenizer = None if language is None else get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            language=language,
            task=task,
        )
        self._audio = np.zeros(0, np.float32)
        self._base = 0  # absolute mel frame index of self._audio[0]
        self._log_max = -np.inf  # running log-mel max over the whole stream
        self._seek = 0  # mel frames consumed (absolute)
        self._all_tokens: List[int] = []
        self._prompt_reset_since = 0
        self._segments: List[dict] = []
        self._input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)
        self._time_precision = self._input_stride * HOP_LENGTH / SAMPLE_RATE
        self._flushed = False
        if partial_hop_s is not None and partial_hop_s <= 0:
            raise ValueError("partial_hop_s must be positive (or None)")
        self.partial_hop_s = partial_hop_s
        # sub-frame hops would degenerate to "partial on every feed()"
        self._partial_hop_frames = (
            max(1, int(partial_hop_s * SAMPLE_RATE) // HOP_LENGTH)
            if partial_hop_s is not None
            else None
        )
        self._last_partial_frames = 0  # content frames at the last partial

    # -- internals ---------------------------------------------------------

    def _detect_window_language(self, mel=None) -> str:
        """detect_language on the stream's current window — built EXACTLY
        like the batch path's detection window (transcribe.py:341-354):
        N_FRAMES frames sliced from the zero-PADDED mel, so a short window's
        tail is mel-of-silence frames, not literal zeros (a decode window
        pads with zeros instead; the two differ, and detection must match
        batch bit-for-bit). Pass the already-computed tail mel to avoid a
        second STFT of the same audio."""
        if mel is None:
            mel = self._tail_mel()
        off = self._seek - max(self._base, self._seek - self._LOOKAHEAD_FRAMES)
        window = mel[:, off : off + N_FRAMES].astype(np.float32)
        _, lang_probs = self.model.detect_language(window)
        return max(lang_probs, key=lang_probs.get)

    def _pin_language(self, mel=None) -> None:
        """Pin the stream's language from its first decoded window and build
        the tokenizer. Finals match batch transcribe(language=None): both
        detect on the frame-0 window of the same (bit-identical) mel."""
        self.language = self._detect_window_language(mel)
        self.tokenizer = get_tokenizer(
            self.model.is_multilingual,
            num_languages=self.model.num_languages,
            language=self.language,
            task=self.task,
        )

    def _decode_window(self, mel_window, language=None) -> DecodingResult:
        result = None
        for t in self.temperatures:
            kwargs = dict(self.decode_options)
            if t > 0:
                kwargs.pop("beam_size", None)
                kwargs.pop("patience", None)
            else:
                kwargs.pop("best_of", None)
            prompt = (
                self._all_tokens[self._prompt_reset_since :]
                if self.condition_on_previous_text
                else []
            )
            options = DecodingOptions(
                language=language or self.language,
                task=self.task,
                temperature=t,
                prompt=prompt,
                **kwargs,
            )
            result = self.model.decode(mel_window, options)
            needs_fallback = False
            if (
                self.compression_ratio_threshold is not None
                and result.compression_ratio > self.compression_ratio_threshold
            ):
                needs_fallback = True
            if (
                self.logprob_threshold is not None
                and result.avg_logprob < self.logprob_threshold
            ):
                needs_fallback = True
            if (
                self.no_speech_threshold is not None
                and result.no_speech_prob > self.no_speech_threshold
                and self.logprob_threshold is not None
                and result.avg_logprob < self.logprob_threshold
            ):
                needs_fallback = False
            if not needs_fallback:
                break
        return result

    def _align_words(self, segments: List[dict], result: DecodingResult,
                     segment_size: int) -> None:
        """Attach word-level timestamps to this window's segments via the
        batch alignment replay (timing.add_word_timestamps): teacher-forced
        prefill over the window's cross-K/V, median-filtered alignment-head
        weights, DTW. Same call the batch path makes (transcribe.py:485-503),
        so finals carry the same `words` as transcribe(word_timestamps=True)."""
        from .timing import add_word_timestamps

        if result.cross_kv is not None:
            ck, cv = result.cross_kv
        else:
            import jax.numpy as jnp

            ck, cv = self.model.cross_kv(jnp.asarray(result.audio_features)[None])
        add_word_timestamps(
            segments=segments,
            model=self.model,
            tokenizer=self.tokenizer,
            num_frames=segment_size,
            ck=ck,
            cv=cv,
            prepend_punctuations=self.prepend_punctuations,
            append_punctuations=self.append_punctuations,
            last_speech_timestamp=self._last_speech_ts,
        )

    # STFT windows look ±N_FFT/2 samples past a frame boundary; waiting for
    # this many extra frames before decoding a non-final window guarantees
    # the emitted frames are bit-identical to a whole-file mel. The same
    # margin of REAL samples to the left of a cut makes a tail mel
    # bit-identical to the whole-file mel from the cut frame onward (the
    # hann window reaches N_FFT/2 = 200 samples back; 2 frames = 320).
    _LOOKAHEAD_FRAMES = 2

    def _content_frames(self) -> int:
        return self._base + len(self._audio) // HOP_LENGTH

    def _tail_mel(self) -> np.ndarray:
        """Normalized mel of the retained tail (+30 s zero pad), with the
        dynamic-range floor anchored to the RUNNING stream-wide max: batch
        transcribe() floors at the whole file's max (stft.py
        normalize_log_mel), so a tail-local max would shift quiet frames
        whenever the stream's loudest moment has been trimmed away. The
        running max covers every frame ever fed (window mels tile the
        stream contiguously), leaving only a true causality gap: a window
        finalized BEFORE the stream's loudest frame arrives uses the
        max-so-far, exactly as a live system must. Returns the mel starting
        at absolute frame max(base, seek - lookahead)."""
        start = max(self._base, self._seek - self._LOOKAHEAD_FRAMES)
        cut = self._audio[(start - self._base) * HOP_LENGTH :]
        raw = log_mel_raw_np(cut, self.model.dims.n_mels, padding=N_SAMPLES)
        self._log_max = max(self._log_max, float(raw.max()))
        return normalize_log_mel(raw, self._log_max)

    def _window_mel(self, avail: int, mel=None):
        """Mel window starting at the absolute frame `self._seek`, computed
        over only the retained tail (O(window), not O(stream age)); frames
        match a whole-stream mel exactly (see _LOOKAHEAD_FRAMES and
        _tail_mel). Pass an already-computed tail mel to share one STFT
        with language detection."""
        if mel is None:
            mel = self._tail_mel()
        off = self._seek - max(self._base, self._seek - self._LOOKAHEAD_FRAMES)
        segment_size = min(N_FRAMES, avail)
        return pad_or_trim(mel[:, off : off + segment_size], N_FRAMES), segment_size

    def _trim_consumed(self) -> None:
        """Drop audio the decode loop can never look at again: everything
        before seek minus the mel margin. Keeps the buffer O(one window)."""
        keep_from = max(self._base, self._seek - self._LOOKAHEAD_FRAMES)
        if keep_from > self._base:
            self._audio = self._audio[(keep_from - self._base) * HOP_LENGTH :]
            self._base = keep_from

    def _process(self, final: bool) -> List[dict]:
        """Decode as many complete windows as the buffer allows."""
        out: List[dict] = []
        while True:
            content_frames = self._content_frames()
            avail = content_frames - self._seek
            if avail <= 0:
                break
            if avail < N_FRAMES + self._LOOKAHEAD_FRAMES and not final:
                break  # wait for a full window (+ mel lookahead margin)
            if final and avail < SAMPLE_RATE // HOP_LENGTH:
                # padding a sub-second tail out to 30 s causes
                # hallucinations; discard it like the batch path
                # (transcribe.py sub-second tail rule, reference :292-297)
                break
            tail_mel = self._tail_mel()  # one STFT shared by decode + detect
            mel_window, segment_size = self._window_mel(avail, tail_mel)
            mel_window = mel_window.astype(np.float32)
            time_offset = float(self._seek * HOP_LENGTH / SAMPLE_RATE)
            if self.language is None:
                self._pin_language(tail_mel)

            result = self._decode_window(mel_window)

            if (
                self.no_speech_threshold is not None
                and result.no_speech_prob > self.no_speech_threshold
                and not (
                    self.logprob_threshold is not None
                    and result.avg_logprob > self.logprob_threshold
                )
            ):
                self._seek += segment_size
                continue

            seek_before = self._seek
            segments, self._seek, lone_final_ts = segments_from_tokens(
                tokens=np.array(result.tokens),
                tokenizer=self.tokenizer,
                result=result,
                seek=self._seek,
                segment_size=segment_size,
                time_offset=time_offset,
                time_precision=self._time_precision,
                input_stride=self._input_stride,
                make_segment=segment_builder(self.tokenizer, seek_before),
            )
            if self.word_timestamps:
                self._align_words(segments, result, segment_size)
                # word-end seek: trust word times over the window size when
                # the decode didn't end on a lone timestamp (batch
                # transcribe.py:506-511)
                if not lone_final_ts:
                    spoken_until = get_end(segments)
                    if spoken_until is not None and spoken_until > time_offset:
                        self._seek = round(spoken_until * FRAMES_PER_SECOND)
                if self.hallucination_silence_threshold is not None:
                    # mid-stream windows treat the not-yet-fed future as
                    # unbounded audio (see __init__ note); at flush the true
                    # bounds apply and decisions match batch exactly
                    if final:
                        cf = content_frames
                        cd = content_frames * HOP_LENGTH / SAMPLE_RATE
                    else:
                        cf, cd = 1 << 62, float("inf")
                    self._seek, restart_window = _silence_skip_pass(
                        window_segments=segments,
                        seek=self._seek,
                        seek_before=seek_before,
                        window_frames=segment_size,
                        window_t0=time_offset,
                        window_t1=float(
                            (seek_before + N_FRAMES) * HOP_LENGTH / SAMPLE_RATE
                        ),
                        window_seconds=segment_size * HOP_LENGTH / SAMPLE_RATE,
                        content_frames=cf,
                        content_duration=cd,
                        threshold=self.hallucination_silence_threshold,
                        lone_final_ts=lone_final_ts,
                        hal_last_end=self._last_speech_ts,
                    )
                    if restart_window:
                        continue
                spoken_until = get_end(segments)
                if spoken_until is not None:
                    self._last_speech_ts = spoken_until
            for seg in segments:
                if seg["start"] == seg["end"] or seg["text"].strip() == "":
                    seg["text"] = ""
                    seg["tokens"] = []
                    seg["words"] = []
            numbered = [
                {"id": i, **seg}
                for i, seg in enumerate(segments, start=len(self._segments))
            ]
            self._segments.extend(numbered)
            out.extend(numbered)
            self._all_tokens.extend(t for seg in segments for t in seg["tokens"])
            if not self.condition_on_previous_text or result.temperature > 0.5:
                self._prompt_reset_since = len(self._all_tokens)
            if final and self._seek >= content_frames:
                break
        return out

    # -- public API ----------------------------------------------------------

    def feed(self, audio: np.ndarray) -> List[dict]:
        """Append PCM (float32 mono @ 16 kHz); returns newly final segments.

        With `partial_hop_s` set, the returned list additionally carries
        advisory segments (flagged `"partial": True`) for the still-open
        window whenever at least that much new audio accumulated since the
        last partial decode. Partials never alter the stream's state; every
        final segment is identical to the partial-free run."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        self._audio = np.concatenate([self._audio, audio])
        out = self._process(final=False)
        self._trim_consumed()
        if self.partial_hop_s is not None:
            content_frames = self._content_frames()
            if (
                content_frames - self._seek > 0
                and content_frames - self._last_partial_frames
                >= self._partial_hop_frames
            ):
                out.extend(self.partial())
        return out

    def partial(self) -> List[dict]:
        """Decode the still-open window RIGHT NOW (padded to a full 30 s
        window) and return advisory segments flagged `"partial": True`.
        Read-only on the stream: seek, prompt conditioning, and the
        finalized transcript are untouched, so later finals supersede these
        without ever differing from a batch `transcribe()`."""
        if self._flushed:
            return []
        content_frames = self._content_frames()
        avail = content_frames - self._seek
        # decoding a sub-second open window padded to 30 s is hallucination
        # bait — the batch path discards such tails outright
        # (transcribe.py sub-second tail rule); hold the partial until at
        # least one second of undecoded audio exists
        if avail < SAMPLE_RATE // HOP_LENGTH:
            return []
        self._last_partial_frames = content_frames
        tail_mel = self._tail_mel()  # one STFT shared by decode + detect
        mel_window, segment_size = self._window_mel(avail, tail_mel)
        mel_window = mel_window.astype(np.float32)
        # before the stream's language is pinned (first FINAL window),
        # partials detect provisionally on the open window — advisory only,
        # never written back, so the pin still happens on the same window
        # batch transcribe() would detect on
        language = self.language
        tokenizer = self.tokenizer
        if language is None:
            language = self._detect_window_language(tail_mel)
            tokenizer = get_tokenizer(
                self.model.is_multilingual,
                num_languages=self.model.num_languages,
                language=language,
                task=self.task,
            )
        result = self._decode_window(mel_window, language=language)
        if (
            self.no_speech_threshold is not None
            and result.no_speech_prob > self.no_speech_threshold
            and not (
                self.logprob_threshold is not None
                and result.avg_logprob > self.logprob_threshold
            )
        ):
            return []
        segments, _, _ = segments_from_tokens(
            tokens=np.array(result.tokens),
            tokenizer=tokenizer,
            result=result,
            seek=self._seek,  # local copy inside; self._seek is NOT advanced
            segment_size=segment_size,
            time_offset=float(self._seek * HOP_LENGTH / SAMPLE_RATE),
            time_precision=self._time_precision,
            input_stride=self._input_stride,
            make_segment=segment_builder(tokenizer, self._seek),
        )
        out = []
        for i, seg in enumerate(segments, start=len(self._segments)):
            if seg["start"] == seg["end"] or seg["text"].strip() == "":
                continue
            out.append({"id": i, **seg, "partial": True})
        return out

    def flush(self) -> List[dict]:
        """Decode the remaining partial window and end the stream."""
        if self._flushed:
            return []
        self._flushed = True
        return self._process(final=True)

    @property
    def decoded_seconds(self) -> float:
        """Stream position already consumed by finalized decoding."""
        return self._seek * HOP_LENGTH / SAMPLE_RATE

    @property
    def result(self) -> dict:
        """transcribe()-shaped result over everything emitted so far.
        `language` is None until auto-detection pins it (first final
        window)."""
        return {
            "text": "".join(seg["text"] for seg in self._segments),
            "segments": self._segments,
            "language": self.language,
        }
