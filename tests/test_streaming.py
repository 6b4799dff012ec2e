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


def test_streaming_requires_language(tpu_model):
    if not tpu_model.is_multilingual:
        pytest.skip("monolingual defaults to en")
    with pytest.raises(ValueError, match="language"):
        StreamingTranscriber(tpu_model)
