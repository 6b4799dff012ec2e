"""Real-checkpoint end-to-end validation on tests/data/jfk.flac.

Mirrors the reference's E2E contract (/root/reference/tests/test_transcribe.py:10-42):
canonical "my fellow Americans" transcript, text == concat(segments),
token round trip, `<|0.00|>` start, monotone word timings with "Americans"
spanning t=1.8 s.

Network is unavailable in the build sandbox, so these run only when an
official checkpoint is already cached under ~/.cache/whisper (or
$XDG_CACHE_HOME/whisper); they skip cleanly otherwise. The moment weights
are available — `python -c "import whisper_tpu; whisper_tpu.load_model('tiny.en')"`
on a networked machine, or a pre-seeded cache — this file is the first thing
to run:

    python -m pytest tests/test_real_checkpoint.py -v -m requires_weights
"""

import os

import pytest

from conftest import JFK


def _cached_checkpoint(name: str):
    """Path of the cached official checkpoint, or None (no download here)."""
    from whisper_tpu.models.registry import _MODELS, default_download_root

    path = os.path.join(default_download_root(), os.path.basename(_MODELS[name]))
    return path if os.path.isfile(path) else None


def _load_real(name: str):
    if _cached_checkpoint(name) is None:
        pytest.skip(f"{name} checkpoint not cached (offline); see module docstring")
    import whisper_tpu

    # float32: matches the reference CPU fp32 oracle regime for tie behavior
    return whisper_tpu.load_model(name, compute_dtype="float32")


@pytest.mark.requires_weights
@pytest.mark.parametrize("model_name", ["tiny", "tiny.en", "base", "turbo"])
def test_transcribe_real_checkpoint(model_name: str):
    from whisper_tpu.tokenizer import get_tokenizer

    model = _load_real(model_name)
    language = "en" if model_name.endswith(".en") else None

    result = model.transcribe(
        JFK, language=language, temperature=0.0, word_timestamps=True
    )
    assert result["language"] == "en"
    assert result["text"] == "".join(s["text"] for s in result["segments"])

    transcription = result["text"].lower()
    assert "my fellow americans" in transcription
    assert "your country" in transcription
    assert "do for you" in transcription

    tokenizer = get_tokenizer(model.is_multilingual, num_languages=model.num_languages)
    all_tokens = [t for s in result["segments"] for t in s["tokens"]]
    assert tokenizer.decode(all_tokens) == result["text"]
    assert tokenizer.decode_with_timestamps(all_tokens).startswith("<|0.00|>")

    timing_checked = False
    for segment in result["segments"]:
        for timing in segment["words"]:
            assert timing["start"] < timing["end"]
            if timing["word"].strip(" ,") == "Americans":
                assert timing["start"] <= 1.8
                assert timing["end"] >= 1.8
                timing_checked = True
    assert timing_checked


@pytest.mark.requires_weights
def test_beam_search_real_checkpoint():
    """Beam-5 decode on a real checkpoint produces the canonical text too
    (the reference's headline config is beam_size=5, README.md:27)."""
    model = _load_real("tiny.en")
    result = model.transcribe(JFK, language="en", temperature=0.0, beam_size=5)
    assert "my fellow americans" in result["text"].lower()


@pytest.mark.requires_weights
def test_language_detection_real_checkpoint():
    """Language auto-detect (broken in the reference fork — model.py:96-107
    comments out Whisper.logits — restored here) identifies English."""
    import whisper_tpu
    from whisper_tpu.audio import load_audio, log_mel_spectrogram, pad_or_trim
    from whisper_tpu.audio import N_FRAMES

    model = _load_real("tiny")
    mel = log_mel_spectrogram(load_audio(JFK), model.dims.n_mels, padding=0)
    lang, probs = model.detect_language(pad_or_trim(mel, N_FRAMES))
    assert lang == "en"
    assert probs["en"] > 0.5
