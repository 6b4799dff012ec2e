"""Multi-stream batched transcription: per-stream results must match
sequential transcribe() for the supported option subset."""

import numpy as np

from whisper_tpu.batch import transcribe_batch


def test_batch_matches_sequential(tpu_model, jfk_audio):
    # two different streams: jfk and a shifted copy
    a1 = jfk_audio
    a2 = jfk_audio[16000 * 2 :]

    batch = transcribe_batch(
        tpu_model,
        [a1, a2],
        language="en",
        temperature=0.0,
        condition_on_previous_text=True,
    )

    singles = [
        tpu_model.transcribe(a, language="en", temperature=0.0, verbose=None)
        for a in (a1, a2)
    ]

    assert len(batch) == 2
    for b, s in zip(batch, singles):
        assert b["text"] == s["text"]
        assert [seg["tokens"] for seg in b["segments"]] == [
            seg["tokens"] for seg in s["segments"]
        ]
        assert b["language"] == "en"


def test_batch_single_stream(tpu_model, jfk_audio):
    [res] = transcribe_batch(tpu_model, [jfk_audio], language="en", temperature=0.0)
    ref = tpu_model.transcribe(jfk_audio, language="en", temperature=0.0, verbose=None)
    assert res["text"] == ref["text"]


def test_chunked_matches_batch(tpu_model, jfk_audio):
    """transcribe_chunked == transcribe_batch over the same fixed chunks,
    with segment times offset per chunk and ids renumbered."""
    import numpy as np

    from whisper_tpu.batch import transcribe_chunked

    long_audio = np.concatenate([jfk_audio, jfk_audio, jfk_audio])  # 33 s
    out = transcribe_chunked(
        tpu_model, long_audio, language="en", temperature=0.0, sample_len=24
    )
    chunks = [long_audio[:480000], long_audio[480000:960000]]
    refs = transcribe_batch(
        tpu_model, chunks, language="en", temperature=0.0,
        condition_on_previous_text=False, sample_len=24,
    )  # fmt: skip
    assert out["text"] == "".join(r["text"] for r in refs)
    assert [s["id"] for s in out["segments"]] == list(range(len(out["segments"])))
    n0 = len(refs[0]["segments"])
    for seg, ref in zip(out["segments"][n0:], refs[1]["segments"]):
        assert abs(seg["start"] - (ref["start"] + 30.0)) < 1e-6


def test_batch_word_timestamps_match_transcribe(tpu_model, jfk_audio):
    [res] = transcribe_batch(
        tpu_model, [jfk_audio], language="en", temperature=0.0, word_timestamps=True
    )
    ref = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, word_timestamps=True, verbose=None
    )
    assert res["text"] == ref["text"]
    words = [w for seg in res["segments"] for w in seg.get("words", [])]
    ref_words = [w for seg in ref["segments"] for w in seg.get("words", [])]
    assert [w["word"] for w in words] == [w["word"] for w in ref_words]
    for a, b in zip(words, ref_words):
        assert abs(a["start"] - b["start"]) < 1e-6
        assert abs(a["end"] - b["end"]) < 1e-6


def test_batch_device_mel_matches_host(tpu_model, jfk_audio, monkeypatch):
    """transcribe_batch with the device frontend (batched device mel + the
    vmapped window-slice program) produces the same transcripts as the host
    numpy mel path."""
    streams = [jfk_audio, jfk_audio[16000 * 3 :]]
    monkeypatch.setenv("WHISPER_TPU_DEVICE_MEL", "0")
    host = transcribe_batch(tpu_model, streams, language="en", temperature=0.0)
    monkeypatch.setenv("WHISPER_TPU_DEVICE_MEL", "1")
    dev = transcribe_batch(tpu_model, streams, language="en", temperature=0.0)
    for a, b in zip(dev, host):
        assert a["text"] == b["text"]
        assert [s["tokens"] for s in a["segments"]] == [
            s["tokens"] for s in b["segments"]
        ]


def test_encode_clip_matches_encode_windows(tpu_model, jfk_audio):
    """frontend.encode_clip (the one-program clip frontend bench.py measures)
    == per-window host mel + encode_with_cross_kv."""
    import jax.numpy as jnp

    from whisper_tpu.audio import N_FRAMES, N_SAMPLES, pad_or_trim
    from whisper_tpu.frontend import encode_clip

    ck, cv, n_windows = encode_clip(tpu_model, jfk_audio)
    assert n_windows == 1  # 11 s clip

    from whisper_tpu import log_mel_spectrogram

    mel = log_mel_spectrogram(jfk_audio, tpu_model.dims.n_mels, padding=N_SAMPLES)
    window = pad_or_trim(mel[:, :N_FRAMES], N_FRAMES).astype(np.float32)
    _, ck_ref, cv_ref = tpu_model.encode_with_cross_kv(jnp.asarray(window)[None])

    assert ck.shape == ck_ref.shape
    assert np.abs(np.asarray(ck) - np.asarray(ck_ref)).max() < 2e-3
    assert np.abs(np.asarray(cv) - np.asarray(cv_ref)).max() < 2e-3


def test_batch_accepts_verbose(tpu_model, jfk_audio):
    """transcribe()/transcribe_batch share caller kwargs; verbose must not
    leak into DecodingOptions (regression: TypeError)."""
    from whisper_tpu.batch import transcribe_batch, transcribe_chunked

    out = transcribe_batch(
        tpu_model, [jfk_audio], language="en", temperature=0.0, verbose=None
    )
    assert len(out) == 1 and "segments" in out[0]
    res = transcribe_chunked(
        tpu_model, jfk_audio, language="en", temperature=0.0, verbose=False
    )
    assert "segments" in res
