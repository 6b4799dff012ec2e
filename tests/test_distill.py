"""Draft distillation: loss goes finite-and-down on a tiny overfit task, the
student checkpoint loads and attaches as a speculative draft with
token-identical transcripts, pseudo-labeling fills missing text, and the
sharded (dp x tp) step matches single-device losses."""

import json

import numpy as np
import pytest

from whisper_tpu.distill import draft_dims, pseudo_label, run_distill
from whisper_tpu.finetune import load_manifest
from whisper_tpu.models.dims import MODEL_DIMS, ModelDimensions


def _student_dims(tiny_dims):
    """Half the synth teacher's width, one layer — a genuinely different
    architecture, same vocab/mels (the draft contract)."""
    return ModelDimensions(
        n_mels=tiny_dims.n_mels,
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


def _manifest(tmp_path, jfk_flac_path, n=2):
    path = tmp_path / "manifest.jsonl"
    recs = [
        {"audio": jfk_flac_path, "text": "ask not what your country can do"},
        {"audio": jfk_flac_path, "text": "my fellow americans"},
        {"audio": jfk_flac_path, "text": "ask not"},
        {"audio": jfk_flac_path, "text": "what you can do for your country"},
    ][:n]
    path.write_text("".join(json.dumps(r) + "\n" for r in recs))
    return str(path)


def test_draft_dims_inherits_vocab_and_mels():
    turbo = MODEL_DIMS["turbo"]
    d = draft_dims(turbo, "tiny")
    assert d.n_vocab == turbo.n_vocab == 51866
    assert d.n_mels == turbo.n_mels == 128
    assert d.n_text_state == MODEL_DIMS["tiny"].n_text_state  # tiny-sized


def test_distill_overfit_and_draft_attaches(tpu_model, tiny_dims, tmp_path, jfk_flac_path):
    import whisper_tpu

    records = load_manifest(_manifest(tmp_path, jfk_flac_path))
    out = str(tmp_path / "draft")
    history = run_distill(
        tpu_model,
        _student_dims(tiny_dims),
        records,
        steps=4,
        batch_size=2,
        out_dir=out,
        learning_rate=1e-3,
        max_tokens=48,
        log=lambda *_: None,
    )
    assert len(history) == 4 and all(np.isfinite(history))
    # overfitting 2 examples at lr 1e-3: the loss must move down
    assert history[-1] < history[0]

    draft = whisper_tpu.load_model(out, compute_dtype="float32")
    assert draft.dims.n_text_state == 64

    mel = np.asarray(
        whisper_tpu.log_mel_spectrogram(
            whisper_tpu.load_audio(jfk_flac_path),
            tpu_model.dims.n_mels,
            padding=480000,
        )
    )[:, :3000]
    plain = tpu_model.decode(
        mel, language="en", temperature=0.0, sample_len=12, fp16=False
    )
    tpu_model.set_draft_model(draft, k=3)
    try:
        spec = tpu_model.decode(
            mel, language="en", temperature=0.0, sample_len=12, fp16=False
        )
    finally:
        tpu_model.set_draft_model(None)
    # speculative emission is the target's argmax by construction: any
    # trained draft must leave the transcript bit-identical
    assert spec.tokens == plain.tokens
    assert spec.text == plain.text


def test_pseudo_label_fills_missing_text(tpu_model):
    # a 2 s synthetic clip keeps the random-weight transcribe cheap
    audio = (np.random.RandomState(3).randn(32000) * 0.1).astype(np.float32)
    recs = pseudo_label(
        tpu_model, [{"audio": audio}, {"audio": audio, "text": "kept"}],
        language="en",
    )
    assert isinstance(recs[0]["text"], str)
    assert recs[1]["text"] == "kept"


def test_distill_sharded_matches_single_device(
    tpu_model, tiny_dims, mesh8, tmp_path, jfk_flac_path
):
    records = load_manifest(_manifest(tmp_path, jfk_flac_path, n=4))
    kw = dict(steps=2, batch_size=4, max_tokens=48, log=lambda *_: None)
    single = run_distill(
        tpu_model, _student_dims(tiny_dims), records,
        out_dir=str(tmp_path / "c1"), **kw,
    )  # fmt: skip
    sharded = run_distill(
        tpu_model, _student_dims(tiny_dims), records,
        out_dir=str(tmp_path / "c2"), mesh=mesh8, **kw,
    )  # fmt: skip
    np.testing.assert_allclose(single, sharded, rtol=1e-4, atol=1e-5)


def test_zero_steps_rejected(tpu_model, tmp_path):
    """steps=0 must raise instead of writing a random-weights checkpoint."""
    from whisper_tpu.distill import run_distill

    with pytest.raises(ValueError, match="steps"):
        run_distill(
            tpu_model,
            "tiny",
            [{"audio": "unused.wav", "text": "x"}],
            steps=0,
            batch_size=1,
            out_dir=str(tmp_path / "draft"),
        )
    assert not (tmp_path / "draft").exists()
