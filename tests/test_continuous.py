"""Continuous batching: window-granular admission must not change any
stream's transcript — every result matches sequential transcribe().

The scheduler invariant under test: a stream's output depends only on its
own audio/prompt state, never on which other streams shared its lockstep
rounds or on when it was admitted (tickets queue behind a full slot set and
enter mid-flight as slots free)."""

import numpy as np
import pytest

from whisper_tpu.continuous import ContinuousBatcher


def _single(model, audio, **kw):
    return model.transcribe(
        audio, language="en", temperature=0.0, verbose=None, **kw
    )


def test_continuous_matches_sequential(tpu_model, jfk_audio):
    a1 = jfk_audio
    a2 = jfk_audio[16000 * 2 :]
    cb = ContinuousBatcher(tpu_model, slots=2, language="en", temperature=0.0)
    t1 = cb.submit(a1)
    t2 = cb.submit(a2)
    cb.drain()
    for t, a in ((t1, a1), (t2, a2)):
        ref = _single(tpu_model, a)
        assert cb.result(t)["text"] == ref["text"]
        assert [s["tokens"] for s in cb.result(t)["segments"]] == [
            s["tokens"] for s in ref["segments"]
        ]


def test_continuous_staggered_admission(tpu_model, jfk_audio):
    """slots=1 with three queued streams of different lengths: each enters
    only when the previous one finishes; mid-drain submission joins the
    queue. All outputs equal their sequential references."""
    long_audio = np.concatenate([jfk_audio, jfk_audio])  # 22 s, 2 windows
    cb = ContinuousBatcher(
        tpu_model, slots=1, language="en", temperature=0.0, sample_len=24,
        condition_on_previous_text=False,
    )
    t1 = cb.submit(long_audio)
    t2 = cb.submit(jfk_audio)
    assert cb.pending() == 2
    # run one round, then submit a third stream mid-flight
    assert cb.step()
    t3 = cb.submit(jfk_audio[16000:])
    cb.drain()
    assert cb.pending() == 0
    for t, a in ((t1, long_audio), (t2, jfk_audio), (t3, jfk_audio[16000:])):
        ref = _single(
            tpu_model, a, sample_len=24, condition_on_previous_text=False
        )
        assert cb.result(t)["text"] == ref["text"], t


def test_continuous_idle_slots_harmless(tpu_model, jfk_audio):
    """A mostly-empty slot set (1 stream in 3 slots) produces the same
    transcript as a full sequential run."""
    cb = ContinuousBatcher(tpu_model, slots=3, language="en", temperature=0.0)
    t = cb.submit(jfk_audio)
    cb.drain()
    assert cb.result(t)["text"] == _single(tpu_model, jfk_audio)["text"]


def test_continuous_short_audio_resolves_immediately(tpu_model):
    cb = ContinuousBatcher(tpu_model, slots=2, language="en")
    t = cb.submit(np.zeros(4000, np.float32))  # 0.25 s: sub-second discard
    assert cb.ready(t)
    assert cb.result(t)["text"] == ""
    assert cb.step() is False  # nothing to do


def test_continuous_result_before_done_raises(tpu_model, jfk_audio):
    cb = ContinuousBatcher(tpu_model, slots=1, language="en", temperature=0.0)
    t = cb.submit(jfk_audio)
    with pytest.raises(KeyError):
        cb.result(t)
    cb.drain()
    assert cb.result(t)["text"]


def test_continuous_word_timestamps(tpu_model, jfk_audio):
    """word_timestamps flows through the shared bookkeeping: words and times
    match sequential transcribe()'s exactly. Probabilities are compared with a
    tolerance: the timing replay reuses the cross-K/V already computed for
    decoding, and the batcher's batch-2 encode tiles its matmuls differently
    from transcribe()'s batch-1 encode (last-bit drift only)."""
    cb = ContinuousBatcher(
        tpu_model, slots=2, language="en", temperature=0.0, word_timestamps=True
    )
    t = cb.submit(jfk_audio)
    cb.drain()
    ref = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, word_timestamps=True,
        verbose=None,
    )
    got = cb.result(t)["segments"]
    want = ref["segments"]
    got_words = [s.get("words") for s in got]
    want_words = [s.get("words") for s in want]
    assert len(got_words) == len(want_words)
    for gw, ww in zip(got_words, want_words):
        assert len(gw) == len(ww)
        for g, w in zip(gw, ww):
            assert (g["word"], g["start"], g["end"]) == (w["word"], w["start"], w["end"])
            assert g["probability"] == pytest.approx(w["probability"], rel=1e-5)


def test_continuous_device_mel_matches_host(tpu_model, jfk_audio, monkeypatch):
    """Device-mel submissions (one upload + device window slices per round)
    produce the same transcripts as the host numpy mel path."""
    def run():
        cb = ContinuousBatcher(tpu_model, slots=2, language="en", temperature=0.0)
        t1 = cb.submit(jfk_audio)
        t2 = cb.submit(jfk_audio[16000 * 3 :])
        cb.drain()
        return [cb.result(t) for t in (t1, t2)]

    monkeypatch.setenv("WHISPER_TPU_DEVICE_MEL", "0")
    host = run()
    monkeypatch.setenv("WHISPER_TPU_DEVICE_MEL", "1")
    dev = run()
    for a, b in zip(dev, host):
        assert a["text"] == b["text"]
        assert [s["tokens"] for s in a["segments"]] == [
            s["tokens"] for s in b["segments"]
        ]


def test_continuous_with_draft_matches_plain(tpu_model, jfk_audio):
    """Speculative decoding composes with the continuous batcher through
    DecodingTask: greedy rounds run the spec engine and transcripts stay
    identical (spec parity is by construction)."""
    from whisper_tpu.models import Whisper
    from whisper_tpu.models.dims import ModelDimensions

    d = tpu_model.dims
    draft = Whisper(
        ModelDimensions(
            n_mels=d.n_mels, n_audio_ctx=d.n_audio_ctx, n_audio_state=64,
            n_audio_head=1, n_audio_layer=1, n_vocab=d.n_vocab, n_text_ctx=448,
            n_text_state=64, n_text_head=1, n_text_layer=1,
        ),  # fmt: skip
        params=None, name="cb-draft", compute_dtype="float32",
    )

    def run():
        cb = ContinuousBatcher(tpu_model, slots=2, language="en", temperature=0.0)
        t1 = cb.submit(jfk_audio)
        t2 = cb.submit(jfk_audio[16000 * 2 :])
        cb.drain()
        return [cb.result(t) for t in (t1, t2)]

    plain = run()
    tpu_model.set_draft_model(draft, k=4)
    try:
        spec = run()
    finally:
        tpu_model.set_draft_model(None)
    for a, b in zip(spec, plain):
        assert a["text"] == b["text"]
        assert [s["tokens"] for s in a["segments"]] == [
            s["tokens"] for s in b["segments"]
        ]


def test_continuous_pop_evicts(tpu_model, jfk_audio):
    cb = ContinuousBatcher(tpu_model, slots=1, language="en", temperature=0.0)
    t = cb.submit(jfk_audio)
    cb.drain()
    r = cb.pop(t)
    assert r["text"]
    assert cb.pending() == 0
    with pytest.raises(KeyError):
        cb.result(t)
    assert not cb._streams and not cb._results and not cb._langs


def test_continuous_beam_matches_sequential(tpu_model, jfk_audio):
    cb = ContinuousBatcher(
        tpu_model, slots=2, language="en", temperature=0.0, beam_size=2
    )
    t = cb.submit(jfk_audio)
    cb.drain()
    ref = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, beam_size=2, verbose=None
    )
    assert cb.result(t)["text"] == ref["text"]


def test_continuous_mesh_and_draft_compose(tpu_model, jfk_audio):
    """The full composition: sharded engines (set_mesh) + speculative
    decoding (set_draft_model) + continuous batching, all at once, produce
    the same transcripts as the plain single-device batcher."""
    import jax

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 virtual devices")
    from whisper_tpu.models import Whisper
    from whisper_tpu.models.dims import ModelDimensions
    from whisper_tpu.parallel.mesh import make_mesh

    d = tpu_model.dims
    draft = Whisper(
        ModelDimensions(
            n_mels=d.n_mels, n_audio_ctx=d.n_audio_ctx, n_audio_state=64,
            n_audio_head=1, n_audio_layer=1, n_vocab=d.n_vocab, n_text_ctx=448,
            n_text_state=64, n_text_head=1, n_text_layer=1,
        ),  # fmt: skip
        params=None, name="compose-draft", compute_dtype="float32",
    )

    def run():
        cb = ContinuousBatcher(tpu_model, slots=4, language="en", temperature=0.0)
        t1 = cb.submit(jfk_audio)
        t2 = cb.submit(jfk_audio[16000 * 2 :])
        cb.drain()
        return [cb.result(t) for t in (t1, t2)]

    plain = run()
    tpu_model.set_mesh(make_mesh(dp=4, tp=2))
    tpu_model.set_draft_model(draft, k=4)
    try:
        combo = run()
    finally:
        tpu_model.set_draft_model(None)
        tpu_model.set_mesh(None)
    for a, b in zip(combo, plain):
        assert a["text"] == b["text"]


def test_submit_rejections_leave_no_state(tpu_model, tmp_path):
    """Failed submissions must not leak stream state or bump the monotonic
    requests_submitted counter (metrics derive backlog from it), and
    per-request languages validate against the tokenizer's table and any
    pinned batcher language."""
    from whisper_tpu.continuous import ContinuousBatcher

    cb = ContinuousBatcher(tpu_model, slots=2, language="en", temperature=0.0)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"definitely not audio")
    with pytest.raises(ValueError):
        cb.submit(str(bad))
    with pytest.raises(ValueError):
        cb.submit(np.zeros(16000, np.float32), language="xx")  # unknown
    with pytest.raises(ValueError):
        cb.submit(np.zeros(16000, np.float32), language="fr")  # pinned en
    assert cb.stats["requests_submitted"] == 0
    assert cb.pending() == 0 and cb._streams == {} and len(cb._queue) == 0

    # full names alias to codes; matching the pin is accepted
    t = cb.submit(np.zeros(16000, np.float32), language="ENGLISH")
    assert cb.stats["requests_submitted"] == 1
    assert cb._langs[t] == "en"


def test_pinned_language_normalizes_like_requests(tpu_model):
    """A batcher pinned with a full language name ('English') must accept
    requests for the same language in any alias form — the pin itself
    normalizes through TO_LANGUAGE_CODE at construction (a raw-string pin
    would reject every request, even 'English' itself, since requests
    normalize to codes)."""
    from whisper_tpu.continuous import ContinuousBatcher

    cb = ContinuousBatcher(tpu_model, slots=1, language="English", temperature=0.0)
    assert cb.language == "en"
    t = cb.submit(np.zeros(16000, np.float32), language="english")
    assert cb._langs[t] == "en"
    t = cb.submit(np.zeros(16000, np.float32), language="EN")
    assert cb._langs[t] == "en"
    with pytest.raises(ValueError):
        cb.submit(np.zeros(16000, np.float32), language="fr")
    with pytest.raises(ValueError):
        ContinuousBatcher(tpu_model, slots=1, language="klingon")


def test_device_mel_round_windows_bucketed():
    """The bucketed round-window builder (one program per mel-length bucket)
    must produce exactly the per-slot device_mel_window results: mixed-length
    streams, mid-stream seeks, tail masking, and idle slots as zero rows."""
    import jax.numpy as jnp

    from whisper_tpu.audio import N_FRAMES
    from whisper_tpu.ops.stft import (
        device_mel_full,
        device_mel_round_windows,
        device_mel_window,
    )

    rng = np.random.RandomState(7)
    # three length buckets: 11 s, 45 s, 70 s -> F = 3000, 6000, 9000 frames
    secs = [11, 45, 70, 11]
    mels, frames = [], []
    for i, sec in enumerate(secs):
        m, cf = device_mel_full(rng.randn(sec * 16000).astype(np.float32) * 0.1, 80)
        mels.append(m)
        frames.append(cf)

    slots = 6
    slot_mels = [mels[0], None, mels[1], mels[2], mels[3], None]
    content = {0: frames[0], 2: frames[1], 3: frames[2], 4: frames[3]}
    seeks = [0, 0, 3000, 6000, 500, 0]
    sizes = [
        min(N_FRAMES, content[i] - seeks[i]) if i in content else 0
        for i in range(slots)
    ]

    got = np.asarray(
        device_mel_round_windows(slot_mels, seeks, sizes, 80), np.float32
    )
    assert got.shape == (slots, 80, N_FRAMES)
    for i in range(slots):
        if slot_mels[i] is None:
            assert np.all(got[i] == 0.0)
        else:
            want = np.asarray(
                device_mel_window(slot_mels[i], seeks[i], sizes[i]), np.float32
            )
            np.testing.assert_array_equal(got[i], want)
