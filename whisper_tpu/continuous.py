"""Continuous batching: a fixed-slot serving scheduler over the lockstep
batched decoder.

`transcribe_batch` (whisper_tpu/batch.py) requires every stream up front and
holds the batch until the LONGEST stream finishes — fine for offline jobs,
wasteful for serving, where requests arrive over time and a 10 s clip should
not wait on a 10 min one. `ContinuousBatcher` keeps a fixed number of SLOTS
(the compiled fused-decode graph is keyed on n_audio == slots, so shapes
never change and nothing recompiles), admits queued requests into slots that
free up at WINDOW granularity — each 30 s lockstep round, finished streams
leave, waiting streams enter — and resolves each request the round its
stream completes.

This is the TPU analog of LLM-serving continuous batching (Orca-style
iteration-level scheduling), applied at Whisper's natural scheduling quantum:
the 30 s window. Per-stream semantics are `transcribe_batch`'s (shared
helpers `_apply_window_result` / `_decode_window_batch` / `_needs_fallback`);
a stream's transcript does not depend on which other streams shared its
rounds — pinned by tests/test_continuous.py against transcribe() output.

No reference analog: the reference processes files strictly sequentially
(/root/reference/whisper/transcribe.py:626-638).

Usage::

    cb = ContinuousBatcher(model, slots=4, language="en")
    t1 = cb.submit(audio1)          # returns a ticket immediately
    t2 = cb.submit(audio2)
    cb.drain()                      # or: while cb.step(): maybe_submit_more()
    result = cb.result(t1)          # same schema as transcribe()
"""

from collections import deque
from typing import Dict, List, Optional, Union

import numpy as np

from .audio import N_FRAMES, N_SAMPLES, log_mel_spectrogram
from .batch import (
    _Stream,
    _apply_window_result,
    _decode_window_batch,
    _needs_fallback,
    _stream_result,
)
from .decoding import DecodingResult
from .utils import exact_div


class ContinuousBatcher:
    """Window-granular continuous batching over a fixed slot count.

    Every lockstep round decodes exactly `slots` windows in one fused batched
    program (idle slots decode silence, discarded), so the graph compiles
    ONCE per (model, slots, beam) and request admission never changes shapes.
    Submissions are cheap (host mel); decoding happens in `step()`/`drain()`.

    Single language group per round keeps the fused batch whole; with
    language=None each stream auto-detects on submission and rounds decode
    per-language sub-batches (variable sub-batch sizes compile per size —
    pin `language` for serving deployments that need one compile).
    `condition_on_previous_text=True` (the default, matching transcribe())
    makes prompts diverge between streams after their first windows, which
    routes rounds through the host-loop engine; serving deployments wanting
    maximum throughput should pass condition_on_previous_text=False, which
    keeps every round a single fused call.
    """

    def __init__(
        self,
        model,
        slots: int = 4,
        *,
        language: Optional[str] = None,
        task: str = "transcribe",
        temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        condition_on_previous_text: bool = True,
        word_timestamps: bool = False,
        prepend_punctuations: str = "\"'\u201c\u00bf([{-",
        append_punctuations: str = "\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001",
        **decode_options,
    ):
        if slots < 1:
            raise ValueError("slots must be >= 1")
        decode_options.pop("verbose", None)  # signature compat (see batch.py)
        if language is not None:
            # normalize the pin the same way submit() normalizes requests
            # ('English' -> 'en'), so pin comparisons are code-vs-code
            from .tokenizer import LANGUAGES, TO_LANGUAGE_CODE

            language = TO_LANGUAGE_CODE.get(language.lower(), language.lower())
            if language not in LANGUAGES:
                raise ValueError(f"unsupported language: {language!r}")
        if language is None and not model.is_multilingual:
            language = "en"  # English-only models have no language tokens
        # reuse the decode pass's cross-K/V in word-timestamp replay only
        decode_options.setdefault("keep_cross_kv", bool(word_timestamps))
        self.model = model
        self.slots = slots
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

        input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)
        from .audio import HOP_LENGTH, SAMPLE_RATE

        self._bookkeeping = dict(
            task=task,
            no_speech_threshold=no_speech_threshold,
            logprob_threshold=logprob_threshold,
            condition_on_previous_text=condition_on_previous_text,
            word_timestamps=word_timestamps,
            prepend_punctuations=prepend_punctuations,
            append_punctuations=append_punctuations,
            input_stride=input_stride,
            time_precision=input_stride * HOP_LENGTH / SAMPLE_RATE,
        )

        from .transcribe import _use_device_mel

        # device mel (TPU default): submit computes the stream's full mel ON
        # DEVICE (one int16 upload + one program, ~ms) instead of the host
        # numpy mel (~0.9 s per minute of audio — measured dominating the
        # serving bench's submit path); per-round windows are then device
        # slices. WHISPER_TPU_DEVICE_MEL=0/1 overrides.
        #
        # A round builds its whole (slots, n_mels, 3000) window stack in ONE
        # program per mel-LENGTH bucket (ops/stft.device_mel_round_windows):
        # slots sharing a bucket ride one jitted slice program with cached
        # zero mels filling the other positions, so a slots=16 round issues
        # 1-3 dispatches instead of 16 (on-chip A/B at slots=16 mixed
        # 30/60 s: 34 vs 55 ms p50 for the round build). Program keys on
        # (slots, bucket length) — still a handful of compiles ever, which
        # is what a deferred-compile remote service needs.
        self._device_mel = _use_device_mel()

        self._queue: deque = deque()  # tickets waiting for a slot
        self._slot_ticket: List[Optional[int]] = [None] * slots
        self._streams: Dict[int, _Stream] = {}
        self._langs: Dict[int, str] = {}
        self._results: Dict[int, dict] = {}
        self._next_ticket = 0
        # operational counters for servers/metrics endpoints (monotonic;
        # never reset by pop()): submitted/completed requests, lockstep
        # rounds with their wall time, and window-decodes performed
        self.stats: Dict[str, float] = {
            "requests_submitted": 0,
            "requests_completed": 0,
            "rounds": 0,
            "round_seconds_sum": 0.0,
            "windows_decoded": 0,
            # per-phase wall time inside step(): window-mel build, fused
            # decode (+fallback ladder), host-side transcript apply — the
            # serving analog of the reference's per-graph predict-time
            # accumulators (coreml.py:7-13)
            "mel_seconds_sum": 0.0,
            "decode_seconds_sum": 0.0,
            "apply_seconds_sum": 0.0,
        }

    # ------------------------------------------------------------------ API

    def submit(
        self, audio: Union[str, np.ndarray], *, language: Optional[str] = None
    ) -> int:
        """Queue one audio (path or waveform) for transcription; returns a
        ticket for `result()`. Computes the mel now (cheap, one pass);
        decoding happens in step()/drain(). `language` overrides
        auto-detection for this request; it must match the batcher language
        when one is pinned (per-request languages don't change compiled
        shapes — streams already group by language per round)."""
        if language is not None:
            from .tokenizer import LANGUAGES, TO_LANGUAGE_CODE

            language = language.lower()
            language = TO_LANGUAGE_CODE.get(language, language)
            if language not in LANGUAGES:
                raise ValueError(f"unsupported language: {language!r}")
            if self.language is not None and language != self.language:
                raise ValueError(
                    f"batcher language is pinned to {self.language!r}"
                )
        if isinstance(audio, str):
            from .audio import load_audio

            try:
                audio = load_audio(audio)
            except ValueError:
                raise
            except Exception as e:
                # an undecodable upload is a caller fault, not an internal
                # error — servers map ValueError to a 4xx response
                raise ValueError(f"could not decode audio: {e}") from e
        ticket = self._next_ticket
        if self._device_mel:
            from .ops.stft import device_mel_full

            wav = np.asarray(audio, np.float32)
            dmel, content_frames = device_mel_full(wav, self.model.dims.n_mels)
            s = _Stream(ticket, None, content_frames)
            s.device_mel = dmel
        else:
            mel = log_mel_spectrogram(audio, self.model.dims.n_mels, padding=N_SAMPLES)
            s = _Stream(ticket, np.asarray(mel), mel.shape[-1] - N_FRAMES)
        if language is not None:
            lang = language
        elif self.language is not None:
            lang = self.language
        else:
            # detect on the stream's full first window (incl. its real
            # silence-mel padding — the host path's mel[:, :N_FRAMES])
            if self._device_mel:
                from .ops.stft import device_mel_window

                first = device_mel_window(s.device_mel, 0, N_FRAMES)
            else:
                first = np.asarray(s.mel[:, :N_FRAMES], np.float32)
            _, probs = self.model.detect_language(first)
            lang = max(probs, key=probs.get)
        # commit point — nothing below raises, so a failed submission
        # leaves no stream state behind and never bumps the counters
        self._next_ticket += 1
        self._streams[ticket] = s
        self._langs[ticket] = lang
        self.stats["requests_submitted"] += 1
        if s.done:  # sub-second audio: resolves immediately with empty text
            self._finalize(ticket)
        else:
            self._queue.append(ticket)
        return ticket

    def pending(self) -> int:
        """Requests not yet resolved (queued + in slots)."""
        return len(self._streams) - len(self._results)

    def ready(self, ticket: int) -> bool:
        return ticket in self._results

    def result(self, ticket: int) -> dict:
        """The transcribe()-schema result dict; raises if not finished."""
        if ticket not in self._results:
            raise KeyError(f"ticket {ticket} not finished (call step()/drain())")
        return self._results[ticket]

    def pop(self, ticket: int) -> dict:
        """result() + evict the ticket's state — long-running servers must
        call this (or result() leaks one stream's segments per request)."""
        out = self.result(ticket)
        del self._results[ticket]
        del self._streams[ticket]
        del self._langs[ticket]
        return out

    def step(self) -> bool:
        """Admit queued requests into free slots and run ONE lockstep window
        round. Returns False when there is nothing left to do."""
        import time as _time

        _t0 = _time.perf_counter()
        for i in range(self.slots):
            if self._slot_ticket[i] is None and self._queue:
                self._slot_ticket[i] = self._queue.popleft()
        occupied = [t for t in self._slot_ticket if t is not None]
        if not occupied:
            return False

        _t_mel = _time.perf_counter()
        prompts: List[List[int]] = [[] for _ in range(self.slots)]
        if self._device_mel:
            from .ops.stft import device_mel_round_windows

            # whole round's window stack in <= #mel-length-buckets (+1)
            # device programs — one dispatch per BUCKET, not per slot
            slot_mels: List = [None] * self.slots
            seeks = [0] * self.slots
            sizes = [0] * self.slots
            for i, ticket in enumerate(self._slot_ticket):
                if ticket is None:
                    continue
                s = self._streams[ticket]
                slot_mels[i] = s.device_mel
                seeks[i] = s.seek
                sizes[i] = min(N_FRAMES, s.content_frames - s.seek)
                if self.condition_on_previous_text:
                    prompts[i] = s.all_tokens[s.prompt_reset_since :]
            mels = device_mel_round_windows(
                slot_mels, seeks, sizes, self.model.dims.n_mels
            )
        else:
            mels = np.zeros(
                (self.slots, self.model.dims.n_mels, N_FRAMES), np.float32
            )
            for i, ticket in enumerate(self._slot_ticket):
                if ticket is None:
                    continue
                s = self._streams[ticket]
                size = min(N_FRAMES, s.content_frames - s.seek)
                window = s.mel[:, s.seek : s.seek + size]
                mels[i, :, : window.shape[-1]] = window
                if self.condition_on_previous_text:
                    prompts[i] = s.all_tokens[s.prompt_reset_since :]

        _t_dec = _time.perf_counter()
        self.stats["mel_seconds_sum"] += _t_dec - _t_mel

        # one fused call per language group (one group when language pinned)
        lang_groups: Dict[str, List[int]] = {}
        for i, ticket in enumerate(self._slot_ticket):
            lang = self._langs[ticket] if ticket is not None else None
            lang_groups.setdefault(lang, []).append(i)
        if None in lang_groups:
            # idle slots ride the largest real group to keep its batch whole
            idle = lang_groups.pop(None)
            if lang_groups:
                biggest = max(lang_groups.values(), key=len)
                biggest.extend(idle)

        results: List[Optional[DecodingResult]] = [None] * self.slots
        for lang, positions in lang_groups.items():
            sub = _decode_window_batch(
                self.model,
                mels[np.asarray(positions)],
                [prompts[p] for p in positions],
                lang,
                self.temperatures[0],
                self.task,
                self.decode_options,
            )
            for slot, r in zip(positions, sub):
                if self._slot_ticket[slot] is None:
                    # idle slots decode silence whose result is discarded —
                    # never run the fallback ladder on them (a hallucinated
                    # silence decode can trip the compression gate, and the
                    # first retry would compile a fresh n_audio=1 graph)
                    results[slot] = r
                    continue
                for t in self.temperatures[1:]:
                    if not _needs_fallback(
                        r,
                        self.compression_ratio_threshold,
                        self.logprob_threshold,
                        self.no_speech_threshold,
                    ):
                        break
                    r = _decode_window_batch(
                        self.model,
                        mels[slot : slot + 1],
                        [prompts[slot]],
                        lang,
                        t,
                        self.task,
                        self.decode_options,
                    )[0]
                results[slot] = r

        _t_apply = _time.perf_counter()
        self.stats["decode_seconds_sum"] += _t_apply - _t_dec

        for i, ticket in enumerate(self._slot_ticket):
            if ticket is None:
                continue
            s = self._streams[ticket]
            _apply_window_result(
                self.model,
                s,
                results[i],
                language=self._langs[ticket],
                **self._bookkeeping,
            )
            if s.done:
                self._finalize(ticket)
                self._slot_ticket[i] = None
        self.stats["rounds"] += 1
        self.stats["round_seconds_sum"] += _time.perf_counter() - _t0
        self.stats["apply_seconds_sum"] += _time.perf_counter() - _t_apply
        self.stats["windows_decoded"] += len(occupied)
        return True

    def drain(self) -> Dict[int, dict]:
        """step() until every submitted request has resolved; returns the
        full ticket -> result mapping."""
        while self.step():
            pass
        return dict(self._results)

    # ------------------------------------------------------------- internal

    def _finalize(self, ticket: int):
        from .audio import HOP_LENGTH, SAMPLE_RATE

        s = self._streams[ticket]
        self.stats["requests_completed"] += 1
        out = _stream_result(self.model, s, self._langs[ticket], self.task)
        # the true audio duration (serving layers report it; transcribe()'s
        # schema has no such field, so only batcher results carry it)
        out["duration"] = round(s.content_frames * HOP_LENGTH / SAMPLE_RATE, 3)
        self._results[ticket] = out
        s.mel = None  # free the host mel
        s.device_mel = None  # free the device mel buffer
