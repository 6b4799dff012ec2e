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
option subset: no clip_timestamps / word timestamps / hallucination
heuristics — use transcribe() for those).

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
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from .decoding import DecodingOptions, DecodingResult
from .tokenizer import get_tokenizer
from .transcribe import segment_builder, segments_from_tokens
from .utils import exact_div


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
        verbose: Optional[bool] = None,  # transcribe() signature compat;
        # streaming emits segments via feed()/flush(), not a live log
        **decode_options,
    ):
        self.model = model
        if language is None and not model.is_multilingual:
            language = "en"
        if language is None:
            raise ValueError(
                "streaming requires a fixed language (auto-detect would need "
                "the first window before emitting anything; pass language=...)"
            )
        self.language = language
        self.task = task
        self.temperatures = (
            [temperature] if isinstance(temperature, (int, float)) else list(temperature)
        )
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        self.condition_on_previous_text = condition_on_previous_text
        self.decode_options = decode_options

        self.tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            language=language,
            task=task,
        )
        self._audio = np.zeros(0, np.float32)
        self._base = 0  # absolute mel frame index of self._audio[0]
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

    def _decode_window(self, mel_window) -> DecodingResult:
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
                language=self.language,
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

    # STFT windows look ±N_FFT/2 samples past a frame boundary; waiting for
    # this many extra frames before decoding a non-final window guarantees
    # the emitted frames are bit-identical to a whole-file mel. The same
    # margin of REAL samples to the left of a cut makes a tail mel
    # bit-identical to the whole-file mel from the cut frame onward (the
    # hann window reaches N_FFT/2 = 200 samples back; 2 frames = 320).
    _LOOKAHEAD_FRAMES = 2

    def _content_frames(self) -> int:
        return self._base + len(self._audio) // HOP_LENGTH

    def _window_mel(self, avail: int):
        """Mel window starting at the absolute frame `self._seek`, computed
        over only the retained tail (O(window), not O(stream age)); frames
        match a whole-stream mel exactly (see _LOOKAHEAD_FRAMES)."""
        start = max(self._base, self._seek - self._LOOKAHEAD_FRAMES)
        cut = self._audio[(start - self._base) * HOP_LENGTH :]
        mel = np.asarray(
            log_mel_spectrogram(cut, self.model.dims.n_mels, padding=N_SAMPLES)
        )
        off = self._seek - start
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
            mel_window, segment_size = self._window_mel(avail)
            time_offset = float(self._seek * HOP_LENGTH / SAMPLE_RATE)

            result = self._decode_window(mel_window.astype(np.float32))

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

            segments, self._seek, _ = segments_from_tokens(
                tokens=np.array(result.tokens),
                tokenizer=self.tokenizer,
                result=result,
                seek=self._seek,
                segment_size=segment_size,
                time_offset=time_offset,
                time_precision=self._time_precision,
                input_stride=self._input_stride,
                make_segment=segment_builder(self.tokenizer, self._seek),
            )
            for seg in segments:
                if seg["start"] == seg["end"] or seg["text"].strip() == "":
                    seg["text"] = ""
                    seg["tokens"] = []
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
        mel_window, segment_size = self._window_mel(avail)
        result = self._decode_window(mel_window.astype(np.float32))
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
            tokenizer=self.tokenizer,
            result=result,
            seek=self._seek,  # local copy inside; self._seek is NOT advanced
            segment_size=segment_size,
            time_offset=float(self._seek * HOP_LENGTH / SAMPLE_RATE),
            time_precision=self._time_precision,
            input_stride=self._input_stride,
            make_segment=segment_builder(self.tokenizer, self._seek),
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
    def result(self) -> dict:
        """transcribe()-shaped result over everything emitted so far."""
        return {
            "text": "".join(seg["text"] for seg in self._segments),
            "segments": self._segments,
            "language": self.language,
        }
