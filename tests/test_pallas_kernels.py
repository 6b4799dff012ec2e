"""Pallas kernel equivalence vs the reference-semantics numpy ops (interpret
mode on CPU; the same kernels compile for TPU — cf. the reference's
CUDA<->CPU equivalence tests, test_timing.py:55-64,87-96)."""

import numpy as np
import pytest

from whisper_tpu.ops.dtw import dtw_np
from whisper_tpu.ops.median import median_filter_np
from whisper_tpu.ops.pallas_kernels import dtw_pallas, median_filter_pallas


@pytest.mark.parametrize("N, M", [(10, 20), (32, 16), (123, 378), (60, 200)])
def test_dtw_pallas_equivalence(N, M):
    rng = np.random.RandomState(1)
    x = rng.randn(N, M).astype(np.float32)
    assert np.array_equal(dtw_np(x), dtw_pallas(x, interpret=True))


@pytest.mark.parametrize("shape", [(1, 15), (4, 5, 345), (12, 240)])
def test_median_pallas_equivalence(shape):
    rng = np.random.RandomState(2)
    x = rng.randn(*shape).astype(np.float32)
    for width in (3, 5, 7, 13):
        a = median_filter_np(x, width)
        b = median_filter_pallas(x, width, interpret=True)
        assert np.allclose(a, b), (shape, width)


def test_word_timing_pallas_path(tpu_model, jfk_audio, monkeypatch):
    """End-to-end word timestamps with WHISPER_TPU_PALLAS=1 must match the
    default path (interpret mode on CPU)."""
    monkeypatch.delenv("WHISPER_TPU_PALLAS", raising=False)
    base = tpu_model.transcribe(
        jfk_audio[: 16000 * 6], language="en", temperature=0.0,
        verbose=None, word_timestamps=True,
    )  # fmt: skip
    monkeypatch.setenv("WHISPER_TPU_PALLAS", "1")
    pallas = tpu_model.transcribe(
        jfk_audio[: 16000 * 6], language="en", temperature=0.0,
        verbose=None, word_timestamps=True,
    )  # fmt: skip
    bw = [w for s in base["segments"] for w in s.get("words", [])]
    pw = [w for s in pallas["segments"] for w in s.get("words", [])]
    assert [w["word"] for w in bw] == [w["word"] for w in pw]
    for a, b in zip(bw, pw):
        assert abs(a["start"] - b["start"]) < 1e-6
        assert abs(a["end"] - b["end"]) < 1e-6
