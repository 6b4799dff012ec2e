"""Fine-tuning driver: data pipeline shapes, loss goes finite-and-down on a
tiny overfit task, checkpoints round-trip into load_model, and the sharded
(dp x tp) run matches single-device losses."""

import json

import numpy as np
import pytest

from whisper_tpu.finetune import PAD_ID, batches, load_manifest, make_example, run_finetune
from whisper_tpu.tokenizer import get_tokenizer


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


def test_make_example_shapes(tpu_model, tmp_path, jfk_flac_path):
    records = load_manifest(_manifest(tmp_path, jfk_flac_path))
    tok = get_tokenizer(tpu_model.is_multilingual, language="en", task="transcribe")
    mel, tokens = make_example(records[0], tok, tpu_model.dims.n_mels, 64)
    assert mel.shape == (tpu_model.dims.n_mels, 3000)
    assert tokens.shape == (64,)
    assert tokens[0] == tok.sot_sequence_including_notimestamps[0]
    assert (tokens == tok.eot).sum() == 1
    assert (tokens == PAD_ID).sum() > 0

    batch = next(
        batches(records, tok, n_mels=tpu_model.dims.n_mels, batch_size=2, max_tokens=64)
    )
    assert batch["mel"].shape == (2, tpu_model.dims.n_mels, 3000)
    assert batch["tokens"].shape == (2, 64)


def test_finetune_loss_decreases_and_checkpoint_loads(
    tpu_model, tmp_path, jfk_flac_path
):
    import whisper_tpu

    records = load_manifest(_manifest(tmp_path, jfk_flac_path))
    out = str(tmp_path / "ckpt")
    history = run_finetune(
        tpu_model,
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

    ft = whisper_tpu.load_model(out, compute_dtype="float32")
    r = ft.decode(
        np.asarray(
            whisper_tpu.log_mel_spectrogram(
                whisper_tpu.load_audio(jfk_flac_path), tpu_model.dims.n_mels, padding=480000
            )
        )[:, :3000],
        language="en",
        temperature=0.0,
        sample_len=8,
        fp16=False,
    )
    assert isinstance(r.text, str)


def test_finetune_sharded_matches_single_device(tpu_model, mesh8, tmp_path, jfk_flac_path):
    # batch 4 == the mesh's dp degree (the sharded step splits mel/tokens
    # over dp, so the batch must be a dp multiple)
    records = load_manifest(_manifest(tmp_path, jfk_flac_path, n=4))
    single = run_finetune(
        tpu_model, records, steps=2, batch_size=4,
        out_dir=str(tmp_path / "c1"), max_tokens=48, log=lambda *_: None,
    )  # fmt: skip
    sharded = run_finetune(
        tpu_model, records, steps=2, batch_size=4, mesh=mesh8,
        out_dir=str(tmp_path / "c2"), max_tokens=48, log=lambda *_: None,
    )  # fmt: skip
    np.testing.assert_allclose(single, sharded, rtol=1e-4, atol=1e-5)


def test_finetune_eval_loss_logged(tpu_model, tmp_path, jfk_flac_path):
    records = load_manifest(_manifest(tmp_path, jfk_flac_path, n=4))
    lines = []
    run_finetune(
        tpu_model, records[:2], steps=2, batch_size=2,
        out_dir=str(tmp_path / "c"), max_tokens=48,
        eval_manifest=records[2:], eval_every=1, log=lines.append,
    )  # fmt: skip
    evals = [ln for ln in lines if "eval_loss" in ln]
    assert len(evals) == 2
    assert all(np.isfinite(float(ln.rsplit(" ", 1)[-1])) for ln in evals)
