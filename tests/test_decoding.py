"""Decoding-engine parity vs the reference: token-for-token on greedy, beam
search (incl. patience), prompts, and language detection (which the reference
fork broke and this framework restores)."""

import numpy as np
import pytest
import torch

import whisper_tpu
from whisper_tpu.decoding import DecodingOptions, DecodingTask, decode


@pytest.fixture(scope="module")
def mel():
    return (np.random.RandomState(5).randn(80, 3000) * 0.6).astype(np.float32)


def _ref_decode(reference_model, mel, **kw):
    import whisper.decoding as rd

    with torch.no_grad():
        return rd.decode(
            reference_model, torch.from_numpy(mel), rd.DecodingOptions(fp16=False, **kw)
        )


@pytest.mark.parametrize(
    "kw",
    [
        dict(language="en", temperature=0.0, sample_len=40),
        dict(language="en", beam_size=2, sample_len=40),
        dict(language="en", beam_size=3, patience=1.5, sample_len=30),
        dict(language="en", without_timestamps=True, sample_len=30),
        dict(language="en", sample_len=30, prompt="hello world test"),
        dict(language="en", sample_len=25, prefix="the quick"),
        dict(language="en", beam_size=2, sample_len=25, length_penalty=0.8),
        dict(language="fr", task="translate", sample_len=25),
    ],
    ids=[
        "greedy",
        "beam2",
        "beam3-patience",
        "no-timestamps",
        "prompt",
        "prefix",
        "beam-length-penalty",
        "translate-fr",
    ],
)
def test_decode_token_parity(reference_model, tpu_model, mel, kw):
    res_ref = _ref_decode(reference_model, mel, **kw)
    res_mine = decode(tpu_model, mel, DecodingOptions(**kw))
    assert res_mine.tokens == res_ref.tokens
    assert abs(res_mine.avg_logprob - res_ref.avg_logprob) < 1e-3
    assert abs(res_mine.no_speech_prob - res_ref.no_speech_prob) < 1e-4
    assert res_mine.text == res_ref.text


def test_option_validation(tpu_model, mel):
    with pytest.raises(ValueError):
        decode(tpu_model, mel, DecodingOptions(beam_size=2, best_of=2))
    with pytest.raises(ValueError):
        decode(tpu_model, mel, DecodingOptions(temperature=0.0, best_of=2))
    with pytest.raises(ValueError):
        decode(tpu_model, mel, DecodingOptions(patience=2.0))
    with pytest.raises(ValueError):
        decode(tpu_model, mel, DecodingOptions(length_penalty=2.0))


def test_batched_decode(tpu_model, mel):
    """Batch of two windows decodes like each window separately."""
    mel2 = np.stack([mel, np.roll(mel, 100, axis=-1)])
    results = decode(tpu_model, mel2, DecodingOptions(language="en", sample_len=20))
    singles = [
        decode(tpu_model, mel2[i], DecodingOptions(language="en", sample_len=20))
        for i in range(2)
    ]
    for r, s in zip(results, singles):
        assert r.tokens == s.tokens


def test_language_detection_restored(tpu_model, mel):
    """The reference fork removed Whisper.logits, so its detect_language
    crashes (reference model.py:96-107). Ours must work."""
    tok_id, probs = tpu_model.detect_language(mel)
    assert isinstance(probs, dict)
    assert len(probs) == 99
    assert abs(sum(probs.values()) - 1.0) < 1e-3
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True)
    assert int(tok_id) in tok.all_language_tokens


def test_temperature_sampling_runs(tpu_model, mel):
    res = decode(
        tpu_model, mel, DecodingOptions(language="en", temperature=0.8, sample_len=20)
    )
    assert len(res.tokens) > 0
    assert res.temperature == 0.8


def test_sot_prev_prompt_structure(tpu_model):
    task = DecodingTask(
        tpu_model, DecodingOptions(language="en", prompt=[1, 2, 3], sample_len=10)
    )
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    assert task.initial_tokens[0] == tok.sot_prev
    assert task.initial_tokens[1:4] == (1, 2, 3)
    assert task.initial_tokens[4:] == tok.sot_sequence


@pytest.mark.requires_reference
def test_english_only_model_parity(tmp_path_factory):
    """gpt2-tokenizer (.en) models decode identically to the reference."""
    import torch
    import whisper_tpu
    from oracle import save_reference_checkpoint, load_reference_model
    from whisper_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(80, 1500, 128, 2, 2, 51864, 448, 128, 2, 2)  # en vocab
    path = str(tmp_path_factory.mktemp("en") / "synth_en.pt")
    save_reference_checkpoint(path, dims, seed=21, scale=0.5)
    ref = load_reference_model(path)
    mine = whisper_tpu.load_model(path, compute_dtype="float32")
    assert not mine.is_multilingual

    mel = (np.random.RandomState(9).randn(80, 3000) * 0.6).astype(np.float32)
    # decode(language=None) on an English-only model raises in both
    # implementations (no language tokens to detect)
    with pytest.raises(ValueError, match="lang id"):
        decode(mine, mel, DecodingOptions(temperature=0.0, sample_len=5))

    r = _ref_decode(ref, mel, language="en", temperature=0.0, sample_len=25)
    m = decode(mine, mel, DecodingOptions(language="en", temperature=0.0, sample_len=25))
    assert m.tokens == r.tokens
    assert m.language == r.language == "en"


def test_lang_id_task(tpu_model, mel):
    """task='lang_id' returns language-only results (reference decoding.py:750-758)."""
    res = decode(tpu_model, mel, DecodingOptions(task="lang_id"))
    assert res.language_probs is not None
    assert len(res.language_probs) == 99
    assert res.tokens == []
    assert res.text == ""


def test_batched_beam_decode(tpu_model, mel):
    """Batched beam search (fused multi-audio path) matches per-window."""
    mel2 = np.stack([mel, np.roll(mel, 57, axis=-1)])
    batch = decode(tpu_model, mel2, DecodingOptions(language="en", beam_size=3, sample_len=25))
    singles = [
        decode(tpu_model, mel2[i], DecodingOptions(language="en", beam_size=3, sample_len=25))
        for i in range(2)
    ]
    for b, s in zip(batch, singles):
        assert b.tokens == s.tokens
        assert abs(b.no_speech_prob - s.no_speech_prob) < 1e-5


def test_cross_kv_retention_opt_in(tpu_model, mel):
    """DecodingResult.cross_kv pins large device buffers, so plain decode()
    must NOT attach it; keep_cross_kv=True (set by transcribe/batch/continuous
    when word_timestamps is on) opts in, and the rows must match a fresh
    cross-KV computation."""
    import jax.numpy as jnp

    kw = dict(language="en", temperature=0.0, sample_len=5)
    plain = decode(tpu_model, mel, DecodingOptions(**kw))
    assert plain.cross_kv is None

    kept = decode(tpu_model, mel, DecodingOptions(keep_cross_kv=True, **kw))
    assert kept.cross_kv is not None
    ck, cv = kept.cross_kv
    ck_ref, cv_ref = tpu_model.cross_kv(jnp.asarray(kept.audio_features)[None])
    np.testing.assert_allclose(np.asarray(ck), np.asarray(ck_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(cv_ref), atol=1e-5)
