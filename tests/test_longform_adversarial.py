"""Adversarial long-form parity fixture (VERDICT r3 missing #2).

A multi-minute synthetic program — real speech, long silence gaps, and
repeated-speech hallucination bait — drives the three data-dependent seek
branches of the long-form orchestrator against the reference oracle:

  1. `clip_timestamps` windows (/root/reference/whisper/transcribe.py:172-181)
  2. the hallucination-silence skip (:429-486) — with random weights every
     word's probability is ~1/vocab (< 0.15), so `is_segment_anomaly` fires
     readily and the skip heuristics actually execute, not just exist
  3. `single_timestamp_ending` seek rules (:350-410) — pinned both E2E and
     by a direct unit test of segments_from_tokens with crafted sequences

The reference runs as a live CPU oracle on the same synthetic checkpoint;
every segment boundary, token sequence, and word timing must match."""

import numpy as np
import pytest
import torch

SR = 16000


@pytest.fixture(scope="module")
def adversarial_audio(jfk_audio):
    """~127 s: speech / 8 s silence / repeated speech (bait) / 15 s silence /
    speech / 6 s silence / repeated speech x3 (bait) / 10 s silence / speech.
    Silence gaps exceed any hallucination_silence_threshold in use; repeats
    mimic the looped-text hallucination pattern the heuristics target."""
    sil = lambda s: np.zeros(int(s * SR), np.float32)  # noqa: E731
    return np.concatenate(
        [
            jfk_audio,
            sil(8),
            np.tile(jfk_audio, 2),
            sil(15),
            jfk_audio,
            sil(6),
            np.tile(jfk_audio, 3),
            sil(10),
            jfk_audio,
        ]
    ).astype(np.float32)


def _segments_match(ref_segments, my_segments, words=False):
    assert len(my_segments) == len(ref_segments)
    for rs, ms in zip(ref_segments, my_segments):
        assert ms["tokens"] == rs["tokens"]
        assert abs(ms["start"] - rs["start"]) < 1e-6
        assert abs(ms["end"] - rs["end"]) < 1e-6
        if words:
            rw, mw = rs.get("words", []), ms.get("words", [])
            assert [w["word"] for w in mw] == [w["word"] for w in rw]
            for a, b in zip(mw, rw):
                assert abs(a["start"] - b["start"]) < 0.05
                assert abs(a["end"] - b["end"]) < 0.05


def test_hallucination_silence_skip_parity(
    reference_model, tpu_model, adversarial_audio, monkeypatch
):
    """word_timestamps + hallucination_silence_threshold: the anomaly
    scoring, leading/surrounded-silence skips, and word-end seek advance
    must take identical decisions to the reference across every window of
    the adversarial program (segment boundaries AND token streams identical;
    a single diverging seek cascades into different windows everywhere
    after, so this pins the whole branch structure).

    Two contrasted runs:
      - WITHOUT the threshold, the word-end seek adjustment
        (/root/reference/whisper/transcribe.py:421-425) runs every window
        and the multi-window structure survives — observable parity;
      - WITH threshold=2.0 and RANDOM weights, every word's probability is
        ~1/vocab (< 0.15) so every segment scores as an anomaly, and the
        surrounded-by-silence cull (:447-481) fires in every window — the
        most adversarial regime the branch has. Both sides must cull
        through IDENTICAL seek chains (the cull itself is the evidence the
        branch executed: strictly fewer segments than the plain run)."""
    # the host f64 alignment path is the reference-fidelity oracle; skip
    # decisions hang on hard thresholds over word times, so parity runs on
    # the path built to match the reference bit-for-bit
    monkeypatch.setenv("WHISPER_TPU_DEVICE_ALIGN", "0")
    base = dict(language="en", temperature=0.0, verbose=None, word_timestamps=True)

    ref_plain = reference_model.transcribe(
        torch.from_numpy(adversarial_audio), fp16=False, **base
    )
    my_plain = tpu_model.transcribe(adversarial_audio, **base)
    assert my_plain["text"] == ref_plain["text"]
    _segments_match(ref_plain["segments"], my_plain["segments"], words=True)
    # real multi-window structure for the threshold run to cull
    assert len(my_plain["segments"]) >= 3
    assert my_plain["segments"][-1]["end"] > 30.0

    kwargs = dict(base, hallucination_silence_threshold=2.0)
    res_ref = reference_model.transcribe(
        torch.from_numpy(adversarial_audio), fp16=False, **kwargs
    )
    res_mine = tpu_model.transcribe(adversarial_audio, **kwargs)
    assert res_mine["text"] == res_ref["text"]
    _segments_match(res_ref["segments"], res_mine["segments"], words=True)
    # the cull demonstrably fired, identically on both sides
    assert len(res_mine["segments"]) < len(my_plain["segments"])


def test_clip_timestamps_parity(reference_model, tpu_model, adversarial_audio):
    """Two disjoint clip windows (5-40 s spanning a silence gap, 60-100 s
    spanning bait repeats): seek must honor clip starts/ends exactly like
    the reference's clip loop, including the window that straddles a clip
    boundary."""
    kwargs = dict(
        language="en", temperature=0.0, verbose=None, clip_timestamps="5,40,60,100"
    )
    res_ref = reference_model.transcribe(
        torch.from_numpy(adversarial_audio), fp16=False, **kwargs
    )
    res_mine = tpu_model.transcribe(adversarial_audio, **kwargs)
    assert res_mine["text"] == res_ref["text"]
    _segments_match(res_ref["segments"], res_mine["segments"])
    # both clips produced segments, and nothing leaked outside a clip
    starts = [s["start"] for s in res_mine["segments"]]
    assert any(t < 41 for t in starts) and any(t >= 60 for t in starts)
    assert all(s["start"] >= 5.0 - 1e-6 for s in res_mine["segments"])


def test_single_timestamp_ending_rules():
    """segments_from_tokens implements the reference's timestamp
    segmentation (/root/reference/whisper/transcribe.py:350-410) exactly:

    - consecutive timestamp PAIRS split the window into slices and seek
      advances to the LAST timestamp's frame position;
    - a window ending in a SINGLE timestamp (single_timestamp_ending) emits
      one segment to the window's end duration and seeks the FULL window —
      no partial-seek — and reports the flag so callers (word-timestamp
      seek adjustment, hallucination skip) can branch on it."""
    from whisper_tpu.decoding import DecodingResult
    from whisper_tpu.tokenizer import get_tokenizer
    from whisper_tpu.transcribe import segment_builder, segments_from_tokens

    tok = get_tokenizer(True, language="en", task="transcribe")
    ts = tok.timestamp_begin  # <|0.00|>; +50 = 1.0 s (0.02 s per step)
    text = tok.encode(" hello")
    seek0, segment_size = 100, 3000

    def run(tokens):
        result = DecodingResult(
            audio_features=None,
            language="en",
            tokens=tokens,
            text=tok.decode(tokens),
            avg_logprob=-0.5,
            no_speech_prob=0.1,
            temperature=0.0,
            compression_ratio=1.0,
        )
        return segments_from_tokens(
            tokens=np.asarray(tokens, np.int64),
            tokenizer=tok,
            result=result,
            seek=seek0,
            segment_size=segment_size,
            time_offset=seek0 / 100.0,
            time_precision=0.02,
            input_stride=2,
            make_segment=segment_builder(tok, seek0),
        )

    off = seek0 / 100.0  # time_offset in seconds

    # (a) pairs + DOUBLE-timestamp ending — NOT single_timestamp_ending:
    # <|1.00|> text <|2.00|><|2.00|> text <|4.00|><|4.00|>
    # two slices; the seek advances to the LAST timestamp's frame position
    tokens = [ts + 50] + text + [ts + 100, ts + 100] + text + [ts + 200, ts + 200]
    segments, seek, single_ending = run(tokens)
    assert single_ending is False
    assert len(segments) == 2
    assert segments[0]["start"] == pytest.approx(off + 1.0)
    assert segments[0]["end"] == pytest.approx(off + 2.0)
    assert segments[1]["start"] == pytest.approx(off + 2.0)
    assert segments[1]["end"] == pytest.approx(off + 4.0)
    assert seek == seek0 + 200 * 2  # last_timestamp_pos * input_stride

    # (b) pairs + SINGLE-timestamp ending: ... text <|4.00|>
    # the tail after the last pair IS emitted as a segment, and the seek
    # advances the FULL window ("no speech after the last timestamp")
    tokens = [ts + 50] + text + [ts + 100, ts + 100] + text + [ts + 200]
    segments, seek, single_ending = run(tokens)
    assert single_ending is True
    assert len(segments) == 2
    assert segments[1]["start"] == pytest.approx(off + 2.0)
    assert segments[1]["end"] == pytest.approx(off + 4.0)
    assert seek == seek0 + segment_size

    # (c) no pairs, ends with TEXT: one whole-window segment whose duration
    # comes from the last (unpaired) timestamp; full-window seek
    tokens = [ts + 50] + text + [ts + 100] + text
    segments, seek, single_ending = run(tokens)
    assert single_ending is False
    assert len(segments) == 1
    assert segments[0]["start"] == pytest.approx(off)
    assert segments[0]["end"] == pytest.approx(off + 2.0)
    assert seek == seek0 + segment_size

    # (d) no pairs, lone timestamp ending — single_timestamp_ending True,
    # same one-segment/duration/full-seek shape as (c)
    tokens = [ts + 50] + text + [ts + 100]
    segments, seek, single_ending = run(tokens)
    assert single_ending is True
    assert len(segments) == 1
    assert segments[0]["start"] == pytest.approx(off)
    assert segments[0]["end"] == pytest.approx(off + 2.0)
    assert seek == seek0 + segment_size
