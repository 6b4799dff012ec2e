"""StreamingTranscriber == transcribe() when the same audio arrives in
chunks (the supported option subset)."""

import numpy as np
import pytest

from whisper_tpu.streaming import StreamingTranscriber


@pytest.mark.parametrize("chunk_seconds", [0.7, 3.0, 31.0])
def test_streaming_matches_transcribe(tpu_model, jfk_audio, chunk_seconds):
    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])  # 33 s
    ref = tpu_model.transcribe(
        long_audio, language="en", temperature=0.0, verbose=None
    )

    st = StreamingTranscriber(tpu_model, language="en", temperature=0.0)
    got = []
    step = int(chunk_seconds * 16000)
    for i in range(0, len(long_audio), step):
        got.extend(st.feed(long_audio[i : i + step]))
    got.extend(st.flush())

    assert st.result["text"] == ref["text"]
    assert [s["tokens"] for s in got] == [s["tokens"] for s in ref["segments"]]
    for a, b in zip(got, ref["segments"]):
        assert abs(a["start"] - b["start"]) < 1e-6
        assert abs(a["end"] - b["end"]) < 1e-6


def test_streaming_incremental_emission(tpu_model, jfk_audio):
    """Segments for the first full window arrive before the stream ends."""
    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])
    st = StreamingTranscriber(tpu_model, language="en", temperature=0.0)
    early = st.feed(long_audio[: 31 * 16000])  # one full window + margin
    assert len(early) > 0  # emitted before flush
    st.feed(long_audio[31 * 16000 :])
    st.flush()
    with pytest.raises(RuntimeError):
        st.feed(np.zeros(10, np.float32))


def test_streaming_language_autodetect(tpu_model, jfk_audio):
    """language=None: streaming detects on its first finalized window — the
    same window batch transcribe(language=None) detects on — then pins it,
    producing identical language + segments."""
    assert tpu_model.is_multilingual
    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])  # 33 s
    ref = tpu_model.transcribe(long_audio, temperature=0.0, verbose=None)

    st = StreamingTranscriber(tpu_model, temperature=0.0)
    assert st.result["language"] is None  # not pinned before any decode
    got = []
    step = 3 * 16000
    for i in range(0, len(long_audio), step):
        got.extend(st.feed(long_audio[i : i + step]))
    got.extend(st.flush())

    assert st.result["language"] == ref["language"]
    assert st.result["text"] == ref["text"]
    assert [s["tokens"] for s in got] == [s["tokens"] for s in ref["segments"]]


def test_streaming_autodetect_partials_before_pin(tpu_model, jfk_audio):
    """Pre-pin partials detect provisionally and never pin: finals still
    match batch transcribe(language=None) exactly."""
    ref = tpu_model.transcribe(jfk_audio, temperature=0.0, verbose=None)
    st = StreamingTranscriber(tpu_model, temperature=0.0)
    st.feed(jfk_audio[: 5 * 16000])
    st.partial()  # provisional detect; must not pin
    assert st.result["language"] is None
    st.feed(jfk_audio[5 * 16000 :])
    finals = st.flush()
    assert st.result["language"] == ref["language"]
    assert [s["tokens"] for s in finals] == [s["tokens"] for s in ref["segments"]]


def test_streaming_word_timestamps(tpu_model, jfk_audio):
    """word_timestamps=True: finals carry the same `words` (text, start,
    end, probability) as batch transcribe(word_timestamps=True), including
    the word-end seek rule's effect on segment boundaries."""
    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])  # 33 s
    ref = tpu_model.transcribe(
        long_audio, language="en", temperature=0.0, verbose=None,
        word_timestamps=True,
    )

    st = StreamingTranscriber(
        tpu_model, language="en", temperature=0.0, word_timestamps=True
    )
    got = []
    step = 4 * 16000
    for i in range(0, len(long_audio), step):
        got.extend(st.feed(long_audio[i : i + step]))
    got.extend(st.flush())

    assert st.result["text"] == ref["text"]
    ref_segs = ref["segments"]
    assert len(got) == len(ref_segs)
    assert any("words" in s and s["words"] for s in got), "no words attached"
    for a, b in zip(got, ref_segs):
        assert a["tokens"] == b["tokens"]
        assert abs(a["start"] - b["start"]) < 1e-6
        assert abs(a["end"] - b["end"]) < 1e-6
        wa, wb = a.get("words", []), b.get("words", [])
        assert len(wa) == len(wb)
        for x, y in zip(wa, wb):
            assert x["word"] == y["word"]
            assert abs(x["start"] - y["start"]) < 1e-6
            assert abs(x["end"] - y["end"]) < 1e-6
            assert abs(x["probability"] - y["probability"]) < 1e-6


def test_streaming_partials_before_first_window(tpu_model, jfk_audio):
    """partial_hop_s: advisory text arrives long before the first 30 s
    window completes, flagged partial=True, and the FINAL output stays
    bit-identical to transcribe() on the concatenated audio — partial
    decodes never touch stream state."""
    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])  # 33 s
    ref = tpu_model.transcribe(
        long_audio, language="en", temperature=0.0, verbose=None
    )

    st = StreamingTranscriber(
        tpu_model, language="en", temperature=0.0, partial_hop_s=2.0
    )
    finals, partials = [], []
    saw_partial_before_first_final = False
    step = 2 * 16000
    for i in range(0, len(long_audio), step):
        for seg in st.feed(long_audio[i : i + step]):
            if seg.get("partial"):
                partials.append(seg)
                if not finals:
                    saw_partial_before_first_final = True
            else:
                finals.append(seg)
    finals.extend(st.flush())

    assert partials, "no partial segments emitted"
    assert saw_partial_before_first_final, (
        "partials must arrive before the first window finalizes"
    )
    assert all(p["text"].strip() for p in partials)
    # finals == batch transcribe, exactly as without partials
    assert st.result["text"] == ref["text"]
    assert [s["tokens"] for s in finals] == [s["tokens"] for s in ref["segments"]]
    for a, b in zip(finals, ref["segments"]):
        assert abs(a["start"] - b["start"]) < 1e-6
        assert abs(a["end"] - b["end"]) < 1e-6
    # partials are advisory only: none were folded into the result
    assert all(not s.get("partial") for s in st.result["segments"])


def test_streaming_partial_on_demand(tpu_model, jfk_audio):
    """partial() decodes the open window immediately and is read-only on
    the stream (same finals afterwards)."""
    st = StreamingTranscriber(tpu_model, language="en", temperature=0.0)
    st.feed(jfk_audio[: 5 * 16000])  # 5 s — nowhere near a full window
    p1 = st.partial()
    p2 = st.partial()  # idempotent: state unchanged between calls
    assert [s["tokens"] for s in p1] == [s["tokens"] for s in p2]
    assert all(s["partial"] for s in p1)
    st.feed(jfk_audio[5 * 16000 :])
    finals = st.flush()
    ref = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, verbose=None
    )
    assert st.result["text"] == ref["text"]
    assert [s["tokens"] for s in finals] == [s["tokens"] for s in ref["segments"]]


def test_streaming_partial_hop_validation(tpu_model):
    with pytest.raises(ValueError, match="partial_hop_s"):
        StreamingTranscriber(tpu_model, language="en", partial_hop_s=0.0)


def test_streaming_hallucination_silence(tpu_model, jfk_audio):
    """hallucination_silence_threshold composes with word_timestamps in
    streaming: the silence-skip pass runs per finalized window with the
    same decisions as batch (gaps engineered away from window boundaries
    so the documented mid-stream causality caveat cannot trigger)."""
    sil = np.zeros(8 * 16000, np.float32)
    audio = np.concatenate(
        [
            jfk_audio[: 5 * 16000],
            sil,
            jfk_audio[5 * 16000 :],
            sil,
            jfk_audio[: 6 * 16000],
        ]
    )  # 33 s with two 8 s silences
    kw = dict(
        language="en",
        temperature=0.0,
        word_timestamps=True,
        hallucination_silence_threshold=2.0,
    )
    ref = tpu_model.transcribe(audio, verbose=None, **kw)

    st = StreamingTranscriber(tpu_model, **kw)
    got = []
    step = 3 * 16000
    for i in range(0, len(audio), step):
        got.extend(st.feed(audio[i : i + step]))
    got.extend(st.flush())

    assert st.result["text"] == ref["text"]
    assert [s["tokens"] for s in got] == [s["tokens"] for s in ref["segments"]]
    for a, b in zip(got, ref["segments"]):
        assert abs(a["start"] - b["start"]) < 1e-6
        assert abs(a["end"] - b["end"]) < 1e-6
