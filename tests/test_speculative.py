"""Speculative greedy decoding == plain fused greedy, token for token.

The speculative engine's output is the TARGET model's filtered argmax at
every position by construction — the draft model only decides how many
positions each verify pass confirms. So for ANY draft (even a useless random
one) the emitted tokens must equal FusedEngine's greedy tokens, which are
themselves pinned against the host loop and the reference (test_fused.py,
test_decoding.py).
"""

import numpy as np
import pytest

from whisper_tpu.engine_fused import FusedEngine
from whisper_tpu.speculative import SpeculativeEngine
from whisper_tpu.tokenizer import get_tokenizer


@pytest.fixture(scope="module")
def mel():
    return (np.random.RandomState(7).randn(80, 3000) * 0.6).astype(np.float32)


@pytest.fixture(scope="module")
def draft_model(tiny_dims):
    """A deliberately different (smaller, independently initialized) draft:
    1 layer x 64 wide vs the target's 2 x 128. Shares n_vocab/tokenizer."""
    from whisper_tpu.models import Whisper
    from whisper_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(
        n_mels=80,
        n_audio_ctx=1500,
        n_audio_state=64,
        n_audio_head=1,
        n_audio_layer=1,
        n_vocab=tiny_dims.n_vocab,
        n_text_ctx=448,
        n_text_state=64,
        n_text_head=1,
        n_text_layer=1,
    )
    return Whisper(dims, params=None, name="spec-draft", compute_dtype="float32")


def _cross_kv(model, mels):
    xa = model.encode(mels)
    return model.cross_kv(xa)


def _run_pair(model, draft, mel, *, k, n_audio=1, suppress=None, **kw):
    tok = get_tokenizer(model.is_multilingual, language="en", task="transcribe")
    rng = np.random.RandomState(13)
    mels = np.stack([mel + 0.05 * i * rng.randn(*mel.shape).astype(np.float32)
                     for i in range(n_audio)])
    ck, cv = _cross_kv(model, mels)
    dck, dcv = _cross_kv(draft, mels)

    initial = np.tile(np.array([list(tok.sot_sequence)], np.int32), (n_audio, 1))
    base = dict(
        sot_index=0,
        suppress_ids=suppress if suppress is not None else [tok.eot],
        blank_ids=tok.encode(" ") + [tok.eot],
        max_initial_ts_index=50,
        eot=tok.eot,
        timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech,
        temperature=0.0,
    )
    base.update(kw)

    fused = FusedEngine(model).run(
        initial, ck, cv, n_group=1, beam_search=False, max_candidates=0, **base
    )
    spec = SpeculativeEngine(model, draft, k=k).run(
        initial, ck, cv, dck, dcv, **base
    )
    return fused, spec, tok


def _assert_match(fused, spec):
    n_f, n_s = int(fused[1]), int(spec[1])
    assert n_s == n_f
    assert np.array_equal(np.asarray(spec[0])[:, :n_f], np.asarray(fused[0])[:, :n_f])
    np.testing.assert_allclose(
        np.asarray(spec[2]), np.asarray(fused[2]), rtol=0, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(spec[3]), np.asarray(fused[3]), rtol=0, atol=1e-5
    )


def test_spec_self_draft_matches_fused(tpu_model, mel):
    """draft == target: every draft is accepted; the loop takes K+1-token
    strides and must still emit exactly the sequential greedy tokens."""
    fused, spec, _ = _run_pair(
        tpu_model, tpu_model, mel, k=4, sample_len=24, use_timestamps=True
    )
    _assert_match(fused, spec)


def test_spec_random_draft_matches_fused(tpu_model, draft_model, mel):
    """A useless draft (independent random weights) costs speed, never
    correctness: near-zero acceptance degenerates to one verified token per
    round plus the bonus."""
    fused, spec, _ = _run_pair(
        tpu_model, draft_model, mel, k=3, sample_len=20, use_timestamps=True
    )
    _assert_match(fused, spec)


def test_spec_multi_audio_divergent_rows(tpu_model, draft_model, mel):
    """Rows accept at different rates, so per-row positions diverge — the
    per-row filter/cache plumbing must keep every row identical to fused."""
    fused, spec, _ = _run_pair(
        tpu_model, draft_model, mel, k=4, n_audio=3, sample_len=18,
        use_timestamps=True,
    )
    _assert_match(fused, spec)


def test_spec_without_timestamps(tpu_model, draft_model, mel):
    fused, spec, _ = _run_pair(
        tpu_model, draft_model, mel, k=4, sample_len=16, use_timestamps=False
    )
    _assert_match(fused, spec)


def test_spec_eot_mid_sequence(tpu_model, mel):
    """EOT mid-sequence must truncate acceptance exactly like the sequential
    greedy loop (EOT logprob included, nothing after it).

    Construction: restrict the vocab to {one text token, EOT} and
    blank-suppress EOT at the first sampling position — the text token is
    forced at position 0, and as soon as EOT's logit beats it at a later
    position the sequence ends mid-chunk. Random weights don't promise any
    particular text token loses to EOT, so probe a few; they only change
    how long the prefix is, never the parity property."""
    tok = get_tokenizer(tpu_model.is_multilingual, language="en", task="transcribe")
    fused = spec = None
    for cand in (tok.encode(" and")[0], 11, 220, 1000, 5000):
        suppress = [
            i for i in range(tpu_model.dims.n_vocab) if i not in (cand, tok.eot)
        ]
        fused, spec, _ = _run_pair(
            tpu_model, tpu_model, mel, k=4, sample_len=12, use_timestamps=False,
            suppress=suppress, blank_ids=[tok.eot],
        )
        _assert_match(fused, spec)
        emitted = np.asarray(fused[0])[0, : int(fused[1])]
        if tok.eot in emitted and emitted[-1] == tok.eot and len(emitted) > 4:
            break
    else:
        pytest.fail("no probe token produced a mid-sequence EOT")


@pytest.mark.parametrize("sample_len", [1, 3, 7])
def test_spec_short_sample_len(tpu_model, draft_model, mel, sample_len):
    """sample_len below / straddling K: acceptance must clip at the cap."""
    fused, spec, _ = _run_pair(
        tpu_model, draft_model, mel, k=4, sample_len=sample_len,
        use_timestamps=True,
    )
    _assert_match(fused, spec)


def test_spec_rejects_beam_and_temperature(tpu_model, draft_model):
    eng = SpeculativeEngine(tpu_model, draft_model)
    with pytest.raises(ValueError):
        eng.run(
            np.zeros((1, 3), np.int32), None, None, None, None,
            sot_index=0, suppress_ids=[], blank_ids=[], max_initial_ts_index=50,
            sample_len=4, use_timestamps=False, eot=1, timestamp_begin=2,
            no_timestamps=3, no_speech=4, beam_search=True, n_group=5,
        )
    with pytest.raises(ValueError):
        eng.run(
            np.zeros((1, 3), np.int32), None, None, None, None,
            sot_index=0, suppress_ids=[], blank_ids=[], max_initial_ts_index=50,
            sample_len=4, use_timestamps=False, eot=1, timestamp_begin=2,
            no_timestamps=3, no_speech=4, temperature=0.5,
        )


def test_spec_vocab_mismatch_rejected(tpu_model, tiny_dims):
    from whisper_tpu.models import Whisper
    from whisper_tpu.models.dims import ModelDimensions

    other = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=1,
        n_audio_layer=1, n_vocab=tiny_dims.n_vocab + 1, n_text_ctx=448,
        n_text_state=64, n_text_head=1, n_text_layer=1,
    )
    bad = Whisper(other, params=None, name="bad-draft", compute_dtype="float32")
    with pytest.raises(ValueError):
        SpeculativeEngine(tpu_model, bad)


# ---------------------------------------------------------------------------
# transcribe()/decode() integration: installing a draft must not change ANY
# output (tokens, text, logprobs within tolerance) — only the speed profile.
# ---------------------------------------------------------------------------


@pytest.fixture()
def draft_installed(tpu_model, draft_model):
    tpu_model.set_draft_model(draft_model, k=4)
    yield tpu_model
    tpu_model.set_draft_model(None)


def test_decode_with_draft_matches_plain(tpu_model, draft_model, mel):
    from whisper_tpu.decoding import DecodingOptions, decode

    opts = DecodingOptions(language="en", temperature=0.0, sample_len=30)
    plain = decode(tpu_model, mel, opts)
    tpu_model.set_draft_model(draft_model, k=4)
    try:
        spec = decode(tpu_model, mel, opts)
    finally:
        tpu_model.set_draft_model(None)
    assert spec.tokens == plain.tokens
    assert spec.text == plain.text
    assert abs(spec.avg_logprob - plain.avg_logprob) < 1e-3
    assert abs(spec.no_speech_prob - plain.no_speech_prob) < 1e-4


def test_decode_beam_ignores_draft(tpu_model, draft_installed, mel):
    """Beam search must silently use the plain engine even with a draft."""
    from whisper_tpu.decoding import DecodingOptions, decode

    opts = DecodingOptions(language="en", beam_size=2, sample_len=16)
    with_draft = decode(draft_installed, mel, opts)
    draft_installed.set_draft_model(None)
    plain = decode(tpu_model, mel, opts)
    assert with_draft.tokens == plain.tokens


def test_transcribe_with_draft_matches_plain(tpu_model, draft_model, jfk_audio):
    """Long-form orchestration (seek rules, fallback ladder) over the
    speculative engine: texts and per-segment tokens must be identical —
    t > 0 ladder retries automatically fall back to the plain engine."""
    np.random.seed(3)  # the t > 0 ladder draws engine rng seeds from the
    # global stream; both runs must see the same draws
    plain = tpu_model.transcribe(jfk_audio, language="en", verbose=None)
    tpu_model.set_draft_model(draft_model, k=4)
    try:
        np.random.seed(3)
        spec = tpu_model.transcribe(jfk_audio, language="en", verbose=None)
    finally:
        tpu_model.set_draft_model(None)
    assert spec["text"] == plain["text"]
    assert [s["tokens"] for s in spec["segments"]] == [
        s["tokens"] for s in plain["segments"]
    ]


def test_set_draft_model_validation(tpu_model, tiny_dims):
    from whisper_tpu.models import Whisper
    from whisper_tpu.models.dims import ModelDimensions

    wrong_mels = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=64, n_audio_head=1,
        n_audio_layer=1, n_vocab=tiny_dims.n_vocab, n_text_ctx=448,
        n_text_state=64, n_text_head=1, n_text_layer=1,
    )
    bad = Whisper(wrong_mels, params=None, name="bad", compute_dtype="float32")
    with pytest.raises(ValueError):
        tpu_model.set_draft_model(bad)
    tpu_model.set_draft_model(None)  # clearing always works
    assert tpu_model.draft_model is None


def test_spec_int8_runs_and_tracks_fused_int8(tpu_model, draft_model, mel):
    """int8 weights mode composes with speculation: the draft and target are
    BOTH quantized and the engine runs deterministically. Exact token
    equality with the int8 fused STEP loop is NOT guaranteed: the verify
    chunk computes logits through (B, K+1, d) matmuls whose bf16 accumulation
    differs from the step loop's (B, 1, d) shapes, so near-tie argmaxes can
    flip under quantization noise (PARITY.md "int8 decode" — the same reason
    int8 itself is a documented non-parity serving mode). Guaranteed and
    asserted here: determinism, and a long common prefix with the fused int8
    engine (the flips are rare ties, not drift)."""
    tok = get_tokenizer(tpu_model.is_multilingual, language="en", task="transcribe")
    mels = mel[None]
    ck, cv = _cross_kv(tpu_model, mels)
    dck, dcv = _cross_kv(draft_model, mels)
    initial = np.array([list(tok.sot_sequence)], np.int32)
    base = dict(
        sot_index=0,
        suppress_ids=[tok.eot],
        blank_ids=tok.encode(" ") + [tok.eot],
        max_initial_ts_index=50,
        sample_len=24,
        use_timestamps=True,
        eot=tok.eot,
        timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech,
        temperature=0.0,
    )
    fused = FusedEngine(tpu_model, weights="int8").run(
        initial, ck, cv, n_group=1, beam_search=False, max_candidates=0, **base
    )
    eng = SpeculativeEngine(tpu_model, draft_model, k=4, weights="int8")
    spec = eng.run(initial, ck, cv, dck, dcv, **base)
    spec2 = eng.run(initial, ck, cv, dck, dcv, **base)

    # determinism
    assert np.array_equal(np.asarray(spec[0]), np.asarray(spec2[0]))
    assert int(spec[1]) == int(spec2[1])

    # long common prefix with the int8 step loop (>= 2/3 of the shorter run)
    n = min(int(fused[1]), int(spec[1]))
    a = np.asarray(fused[0])[0, :n]
    b = np.asarray(spec[0])[0, :n]
    agree = int(np.argmin(a == b)) if not np.all(a == b) else n
    assert agree >= (2 * n) // 3, (agree, n, a.tolist(), b.tolist())


def test_engine_rejects_overlong_prompt(tpu_model, draft_model):
    """Prompts past the 256-token prefill window must raise, not silently
    truncate (both engines; the step-0 logits would come from the wrong
    position)."""
    from whisper_tpu.models.graphs import PREFILL_LEN

    bad = np.zeros((1, PREFILL_LEN + 10), np.int32)
    kw = dict(
        sot_index=0, suppress_ids=[1], blank_ids=[1], max_initial_ts_index=50,
        sample_len=8, use_timestamps=False, temperature=0.0, eot=50257,
        timestamp_begin=50365, no_timestamps=50364, no_speech=50363,
    )  # fmt: skip
    with pytest.raises(ValueError, match="prefill"):
        FusedEngine(tpu_model).run(
            bad, None, None, n_group=1, beam_search=False, max_candidates=0, **kw
        )
    with pytest.raises(ValueError, match="prefill"):
        SpeculativeEngine(tpu_model, draft_model, k=4).run(
            bad, None, None, None, None, **kw
        )


def test_spec_rejects_overlong_sample_len(tpu_model, draft_model):
    """sample_len that would hit the K+1 verify headroom must raise rather
    than silently emit fewer tokens than FusedEngine would."""
    initial = np.zeros((1, 100), np.int32)
    kw = dict(
        sot_index=0, suppress_ids=[1], blank_ids=[1], max_initial_ts_index=50,
        sample_len=348, use_timestamps=False, temperature=0.0, eot=50257,
        timestamp_begin=50365, no_timestamps=50364, no_speech=50363,
    )  # fmt: skip
    with pytest.raises(ValueError, match="K - 1"):
        SpeculativeEngine(tpu_model, draft_model, k=4).run(
            initial, None, None, None, None, **kw
        )


def test_acceptance_stats(tpu_model, draft_model, mel):
    """`last_stats` telemetry: a self-draft (draft == target) accepts every
    proposal — acceptance exactly 1.0 with ceil((emitted-1)/(K+1)) rounds —
    while an independent random draft lands strictly below. This is the
    signal distill.py's training exists to raise.

    Vocab narrowed to 3 tokens so draft/target argmax agreement is decided
    by O(1) logit gaps, not float-accumulation near-ties (the chunked verify
    pass sums in a different order than the draft's single-token steps)."""
    tok = get_tokenizer(tpu_model.is_multilingual, language="en", task="transcribe")
    mels = mel[None]
    ck, cv = _cross_kv(tpu_model, mels)
    dck, dcv = _cross_kv(draft_model, mels)
    initial = np.array([list(tok.sot_sequence)], np.int32)
    narrow = [i for i in range(tpu_model.dims.n_vocab) if i not in (100, 200, 300)]
    base = dict(
        sot_index=0, suppress_ids=narrow, blank_ids=[220],
        max_initial_ts_index=None, sample_len=13, use_timestamps=False,
        eot=tok.eot, timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps, no_speech=tok.no_speech,
        temperature=0.0,
    )  # fmt: skip

    eng = SpeculativeEngine(tpu_model, tpu_model, k=3)
    out = eng.run(initial, ck, cv, ck, cv, **base)
    st = eng.last_stats
    assert st["k"] == 3
    assert st["emitted"] == [13]
    assert st["rounds"] == [3]  # 1 prefill token + 3 rounds x (K+1)
    assert st["draft_acceptance"] == [1.0]
    assert int(out[1]) == initial.shape[1] + 13  # contract tuple unchanged

    eng2 = SpeculativeEngine(tpu_model, draft_model, k=3)
    eng2.run(initial, ck, cv, dck, dcv, **base)
    st2 = eng2.last_stats
    assert st2["emitted"] == [13]
    assert st2["rounds"][0] >= 3  # rejections cost extra rounds
    assert 0.0 <= st2["draft_acceptance"][0] < 1.0
