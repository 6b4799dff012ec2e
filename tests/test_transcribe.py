"""End-to-end transcription parity vs the reference on tests/jfk.flac with a
synthetic checkpoint (cf. /root/reference/tests/test_transcribe.py), plus
writer output checks."""

import json
import os

import numpy as np
import pytest
import torch

from conftest import JFK
from whisper_tpu.utils import get_writer


@pytest.fixture(scope="module")
def transcripts(reference_model, tpu_model, jfk_audio):
    res_ref = reference_model.transcribe(
        torch.from_numpy(jfk_audio),
        language="en",
        temperature=0.0,
        verbose=None,
        fp16=False,
    )
    res_mine = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, verbose=None
    )
    return res_ref, res_mine


def test_transcribe_text_parity(transcripts):
    res_ref, res_mine = transcripts
    assert res_mine["language"] == res_ref["language"] == "en"
    assert res_mine["text"] == res_ref["text"]
    assert len(res_mine["segments"]) == len(res_ref["segments"])
    for rs, ms in zip(res_ref["segments"], res_mine["segments"]):
        assert ms["tokens"] == rs["tokens"]
        assert abs(ms["start"] - rs["start"]) < 1e-6
        assert abs(ms["end"] - rs["end"]) < 1e-6
        assert abs(ms["avg_logprob"] - rs["avg_logprob"]) < 1e-3
        assert abs(ms["no_speech_prob"] - rs["no_speech_prob"]) < 1e-4


def test_transcribe_text_is_segment_concat(transcripts):
    _, res = transcripts
    assert res["text"] == "".join(s["text"] for s in res["segments"])


def test_long_form_multiwindow_parity(reference_model, tpu_model, jfk_audio):
    """Seek-loop parity on real speech spanning three 30 s windows
    (jfk.flac x6 = 66 s): window boundaries, previous-text conditioning, and
    per-window timestamp offsets must match the reference transcribe loop
    (/root/reference/whisper/transcribe.py seek rules)."""
    long_audio = np.tile(jfk_audio, 6)
    res_ref = reference_model.transcribe(
        torch.from_numpy(long_audio),
        language="en",
        temperature=0.0,
        verbose=None,
        fp16=False,
    )
    res_mine = tpu_model.transcribe(
        long_audio, language="en", temperature=0.0, verbose=None
    )
    assert res_mine["text"] == res_ref["text"]
    assert len(res_mine["segments"]) == len(res_ref["segments"])
    for rs, ms in zip(res_ref["segments"], res_mine["segments"]):
        assert ms["tokens"] == rs["tokens"]
        assert abs(ms["start"] - rs["start"]) < 1e-6
        assert abs(ms["end"] - rs["end"]) < 1e-6
    # the clip genuinely spans multiple seek windows
    assert res_mine["segments"][-1]["end"] > 30.0


def test_word_timestamps_parity(reference_model, tpu_model, jfk_audio):
    res_ref = reference_model.transcribe(
        torch.from_numpy(jfk_audio),
        language="en",
        temperature=0.0,
        verbose=None,
        fp16=False,
        word_timestamps=True,
    )
    res_mine = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, verbose=None, word_timestamps=True
    )
    ref_words = [w for s in res_ref["segments"] for w in s.get("words", [])]
    my_words = [w for s in res_mine["segments"] for w in s.get("words", [])]
    assert [w["word"] for w in my_words] == [w["word"] for w in ref_words]
    for a, b in zip(my_words, ref_words):
        assert abs(a["start"] - b["start"]) < 0.05
        assert abs(a["end"] - b["end"]) < 0.05
    # timings are monotone
    starts = [w["start"] for w in my_words]
    ends = [w["end"] for w in my_words]
    assert all(s <= e for s, e in zip(starts, ends))


def test_writers(transcripts, tmp_path):
    _, result = transcripts
    # writers require a words key on every segment when any segment has one
    for fmt in ["txt", "vtt", "srt", "tsv", "json"]:
        writer = get_writer(fmt, str(tmp_path))
        writer(result, "jfk.flac")
        out = tmp_path / f"jfk.{fmt}"
        assert out.exists() and out.stat().st_size > 0

    data = json.loads((tmp_path / "jfk.json").read_text())
    assert data["text"] == result["text"]
    srt = (tmp_path / "jfk.srt").read_text()
    assert "-->" in srt

    all_writer = get_writer("all", str(tmp_path / "all"))
    os.makedirs(tmp_path / "all", exist_ok=True)
    all_writer(result, "jfk.flac")
    assert (tmp_path / "all" / "jfk.vtt").exists()


def test_device_mel_transcribe_matches_host(tpu_model, jfk_audio, monkeypatch):
    """transcribe() with the on-device mel (jitted DFT-matmul STFT + device
    window slicing) produces the same transcript as the host numpy mel."""
    monkeypatch.setenv("WHISPER_TPU_DEVICE_MEL", "0")
    res_host = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, verbose=None
    )
    monkeypatch.setenv("WHISPER_TPU_DEVICE_MEL", "1")
    res_dev = tpu_model.transcribe(
        jfk_audio, language="en", temperature=0.0, verbose=None
    )
    assert res_dev["text"] == res_host["text"]
    assert len(res_dev["segments"]) == len(res_host["segments"])
    for a, b in zip(res_dev["segments"], res_host["segments"]):
        assert a["tokens"] == b["tokens"]
        assert a["start"] == b["start"] and a["end"] == b["end"]


def test_device_mel_full_matches_host_mel(jfk_audio):
    """device_mel_full == host log_mel_spectrogram(padding=N_SAMPLES) on the
    true-content frames, and content_frames matches."""
    from whisper_tpu.audio import N_FRAMES, N_SAMPLES
    from whisper_tpu.ops.stft import device_mel_full, device_mel_window

    host = np.asarray(
        __import__("whisper_tpu").log_mel_spectrogram(jfk_audio, 80, padding=N_SAMPLES)
    )
    dev, content_frames = device_mel_full(jfk_audio, 80)
    assert content_frames == host.shape[-1] - N_FRAMES
    dev_np = np.asarray(dev)
    assert dev_np.shape[-1] >= host.shape[-1]
    assert np.abs(dev_np[:, : host.shape[-1]] - host).max() < 5e-5

    # window slicing: tail window zero-masked exactly like host pad_or_trim
    seek, seg = content_frames - 100, 100
    win = np.asarray(device_mel_window(dev, seek, seg))
    from whisper_tpu.audio import pad_or_trim

    host_win = pad_or_trim(host[:, seek : seek + seg], N_FRAMES).astype(np.float32)
    assert win.shape == host_win.shape
    assert np.abs(win - host_win).max() < 5e-5
    assert np.all(win[:, seg:] == 0.0)


def test_clip_timestamps(tpu_model, jfk_audio):
    res = tpu_model.transcribe(
        jfk_audio,
        language="en",
        temperature=0.0,
        verbose=None,
        clip_timestamps="2,8",
    )
    assert all(s["start"] >= 2.0 - 1e-6 for s in res["segments"])


def test_initial_prompt_carries(tpu_model, jfk_audio):
    res = tpu_model.transcribe(
        jfk_audio[: 16000 * 5],
        language="en",
        temperature=0.0,
        verbose=None,
        initial_prompt="Greetings",
        carry_initial_prompt=True,
    )
    assert "text" in res


def test_cli_parallel(tpu_model, synth_checkpoint, tmp_path, monkeypatch, capsys):
    """whisper-tpu --parallel writes one output set per input file."""
    import shutil
    import sys

    from whisper_tpu.cli import cli

    wav_a = str(tmp_path / "a.flac")
    wav_b = str(tmp_path / "b.flac")
    shutil.copy(JFK, wav_a)
    shutil.copy(JFK, wav_b)
    monkeypatch.setattr(
        sys, "argv",
        ["whisper-tpu", wav_a, wav_b, "--parallel", "True",
         "--model", synth_checkpoint, "--language", "en",
         "--temperature", "0", "--temperature_increment_on_fallback", "None",
         "--output_dir", str(tmp_path / "out"), "--output_format", "txt",
         "--verbose", "False"],
    )  # fmt: skip
    cli()
    out_a = (tmp_path / "out" / "a.txt").read_text()
    out_b = (tmp_path / "out" / "b.txt").read_text()
    assert out_a == out_b  # identical audio -> identical transcript


def test_cli_int8_weights(tpu_model, synth_checkpoint, tmp_path, monkeypatch):
    """whisper-tpu --weights int8 transcribes end-to-end through the
    quantized fused engine (env plumbing -> FusedEngine(weights='int8'))."""
    import shutil
    import sys

    from whisper_tpu.cli import cli

    wav = str(tmp_path / "c.flac")
    shutil.copy(JFK, wav)
    # setenv (not delenv): delenv on a NONEXISTENT var records nothing, so
    # the value cli() sets would leak into later tests in this process and
    # silently flip their engines to int8 (caught as an order-dependent
    # parity failure). setenv snapshots state; teardown restores "".
    monkeypatch.setenv("WHISPER_TPU_WEIGHTS", "")
    monkeypatch.setattr(
        sys, "argv",
        ["whisper-tpu", wav, "--weights", "int8",
         "--model", synth_checkpoint, "--language", "en",
         "--temperature", "0", "--temperature_increment_on_fallback", "None",
         "--output_dir", str(tmp_path / "out8"), "--output_format", "txt",
         "--verbose", "False"],
    )  # fmt: skip
    cli()
    assert (tmp_path / "out8" / "c.txt").exists()
    assert os.environ.get("WHISPER_TPU_WEIGHTS") == "int8"
