"""Fused on-device decode loop vs the host-loop engine: token-for-token.

The host engine is pinned against the reference (test_decoding.py), so
fused == host == reference transitively."""

import numpy as np
import pytest

from whisper_tpu.decoding import DecodingOptions, decode


@pytest.fixture(scope="module")
def mel():
    return (np.random.RandomState(5).randn(80, 3000) * 0.6).astype(np.float32)


@pytest.mark.parametrize(
    "kw",
    [
        dict(language="en", temperature=0.0, sample_len=40),
        dict(language="en", beam_size=2, sample_len=40),
        dict(language="en", beam_size=5, sample_len=30),
        dict(language="en", beam_size=3, patience=1.5, sample_len=30),
        dict(language="en", without_timestamps=True, sample_len=30),
        dict(language="en", sample_len=30, prompt="hello world test"),
        dict(language="en", sample_len=25, prefix="the quick"),
    ],
    ids=["greedy", "beam2", "beam5", "beam3-patience", "no-ts", "prompt", "prefix"],
)
def test_fused_matches_host(tpu_model, mel, kw):
    tpu_model.use_fused_decode = False
    host = decode(tpu_model, mel, DecodingOptions(**kw))
    tpu_model.use_fused_decode = True
    fused = decode(tpu_model, mel, DecodingOptions(**kw))

    assert fused.tokens == host.tokens
    assert fused.text == host.text
    assert abs(fused.avg_logprob - host.avg_logprob) < 1e-4
    assert abs(fused.no_speech_prob - host.no_speech_prob) < 1e-4


def test_fused_transcribe_matches_host(tpu_model, jfk_audio):
    tpu_model.use_fused_decode = False
    host = tpu_model.transcribe(jfk_audio, language="en", temperature=0.0, verbose=None)
    tpu_model.use_fused_decode = True
    fused = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, verbose=None
    )
    assert fused["text"] == host["text"]
    assert [s["tokens"] for s in fused["segments"]] == [
        s["tokens"] for s in host["segments"]
    ]


def test_engine_warmup_matches_cold_run(tpu_model, mel):
    """FusedEngine.warmup (zero cross-KV dispatch, used to overlap server
    compiles with the encoder's) must leave the engine producing the exact
    tokens a cold engine produces."""
    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(tpu_model.is_multilingual, language="en", task="transcribe")
    xa = tpu_model.encode(mel[None])
    ck, cv = tpu_model.cross_kv(xa)
    initial = np.array([list(tok.sot_sequence)], np.int32)
    kw = dict(
        sot_index=0, suppress_ids=[tok.eot], blank_ids=tok.encode(" ") + [tok.eot],
        max_initial_ts_index=50, sample_len=12, n_group=2, beam_search=True,
        max_candidates=2, use_timestamps=True, temperature=0.0, eot=tok.eot,
        timestamp_begin=tok.timestamp_begin, no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech,
    )  # fmt: skip

    cold = FusedEngine(tpu_model).run(initial, ck, cv, **kw)

    warmed_engine = FusedEngine(tpu_model)
    warm_out = warmed_engine.warmup(initial, **kw)
    assert int(warm_out[1]) > 0  # the dummy decode actually ran
    warm = warmed_engine.run(initial, ck, cv, **kw)

    n = int(cold[1])
    assert int(warm[1]) == n
    assert np.array_equal(np.asarray(warm[0])[:, :n], np.asarray(cold[0])[:, :n])


def test_fused_sampling_terminates(tpu_model, mel):
    res = decode(
        tpu_model, mel, DecodingOptions(language="en", temperature=0.7, sample_len=20)
    )
    assert 0 < len(res.tokens) <= 20


@pytest.mark.parametrize(
    "kw",
    [
        dict(language="en", temperature=0.0, sample_len=8),
        # beam search through the kernel path end-to-end (finished pools,
        # row_map reorder, patience bookkeeping)
        dict(language="en", beam_size=2, sample_len=8),
        # temperature > 0 exercises the lax.cond FALLBACK branch inside the
        # pallas-greedy update (the kernel itself only handles t == 0); the
        # rng split sequence is shared, so tokens must still be identical
        dict(language="en", temperature=0.7, sample_len=8),
    ],
    ids=["greedy", "beam2", "sampling-fallback"],
)
def test_fused_pallas_wiring(tpu_model, mel, kw, monkeypatch):
    """The default-OFF Pallas update kernels (interpret mode on CPU) produce
    the same tokens as the jnp fused path end-to-end — covers the cond/finish
    plumbing, not just the kernel math (test_beam_kernel.py). Together with
    test_beam_kernel.py this is the bit-rot guard for every semantics-bearing
    path of ops/beam_kernel.py: greedy t==0 (kernel), greedy t>0 (fallback
    branch), beam search (kernel incl. finished pools), timestamp rules
    on/off (test_beam_kernel.py parametrization)."""
    monkeypatch.setenv("WHISPER_TPU_PALLAS_BEAM", "0")
    tpu_model.use_fused_decode = True
    np.random.seed(3)  # pins the engine's per-call rng_seed draw at t > 0
    base = decode(tpu_model, mel, DecodingOptions(**kw))
    monkeypatch.setenv("WHISPER_TPU_PALLAS_BEAM", "1")
    np.random.seed(3)
    kern = decode(tpu_model, mel, DecodingOptions(**kw))
    assert kern.tokens == base.tokens
    assert abs(kern.avg_logprob - base.avg_logprob) < 1e-4


@pytest.mark.parametrize(
    "kw",
    [
        dict(language="en", temperature=0.0, sample_len=135),
        dict(language="en", beam_size=2, sample_len=135),
        # long prompt -> sample_begin > 128: the first bucket phase must be
        # skipped entirely (its entry condition starts false)
        dict(language="en", temperature=0.0, sample_len=20,
             prompt=" ".join(["word"] * 130)),
    ],
    ids=["greedy-cross-128", "beam2-cross-128", "prompt-starts-past-128"],
)
def test_fused_bucket_boundaries(tpu_model, mel, kw):
    """The bucketed cache phases (128/256/448) must hand off mid-decode with
    no token divergence from the host loop."""
    tpu_model.use_fused_decode = False
    host = decode(tpu_model, mel, DecodingOptions(**kw))
    tpu_model.use_fused_decode = True
    fused = decode(tpu_model, mel, DecodingOptions(**kw))
    assert fused.tokens == host.tokens
    assert abs(fused.avg_logprob - host.avg_logprob) < 1e-4
