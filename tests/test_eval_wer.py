"""Offline validation of the WER eval harness (tools/eval_wer.py).

The real LibriSpeech run needs network (data/README.md); what CAN be pinned
offline is the harness itself: the Levenshtein WER math, the LibriSpeech
directory walker, and the end-to-end transcribe->normalize->score loop —
exercised on a synthetic "dataset" built from jfk.flac where the reference
transcript IS the synthetic model's own output, so overall WER must be 0.
"""

import os
import shutil
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
sys.path.insert(0, TOOLS)

from conftest import JFK  # noqa: E402


def test_word_error_rate_math():
    from eval_wer import word_error_rate

    assert word_error_rate("a b c".split(), "a b c".split()) == 0.0
    assert word_error_rate("a b c".split(), "a x c".split()) == pytest.approx(1 / 3)
    assert word_error_rate("a b c".split(), "a c".split()) == pytest.approx(1 / 3)
    assert word_error_rate("a b".split(), "a x b y".split()) == pytest.approx(1.0)
    assert word_error_rate([], []) == 0.0
    assert word_error_rate([], ["x"]) == 1.0
    # WER can exceed 1 when the hypothesis is much longer
    assert word_error_rate(["a"], "x y z".split()) == 3.0


@pytest.mark.slow
def test_librispeech_layout_end_to_end(tpu_model, synth_checkpoint, tmp_path):
    """Walk the official LibriSpeech layout and score the synthetic model
    against its own transcript: overall WER must come out exactly 0."""
    res = tpu_model.transcribe(JFK, language="en", temperature=0.0, verbose=None)
    ref_text = res["text"].strip()
    if not ref_text:
        pytest.skip("synthetic model produced an empty transcript")

    # <root>/<spk>/<chap>/<spk>-<chap>-<utt>.flac + <spk>-<chap>.trans.txt
    chap = tmp_path / "ls" / "1" / "2"
    chap.mkdir(parents=True)
    shutil.copy(JFK, chap / "1-2-0000.flac")
    (chap / "1-2.trans.txt").write_text(f"1-2-0000 {ref_text}\n")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "eval_wer.py"),
            "--librispeech",
            str(tmp_path / "ls"),
            "--model",
            synth_checkpoint,
            "--dtype",
            "float32",
            # pin the ladder: synthetic-weight text trips the quality gates
            # and would re-decode with sampling (nondeterministic)
            "--temperature",
            "0",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr
    assert "overall WER: 0.0000" in out.stdout, out.stdout


@pytest.mark.slow
def test_validate_real_spec_acceptance_section(tpu_model, synth_checkpoint, monkeypatch):
    """The validate_real.py speculative-acceptance section runs end to end
    on a synthetic checkpoint (model doubles as its own draft): acceptance
    rates land in [0, 1], both K brackets report, and the plain baseline is
    timed — so the harness is proven live before real weights ever arrive."""
    import validate_real

    monkeypatch.setattr(validate_real, "cached", lambda name: True)
    out = validate_real.run_spec_acceptance(synth_checkpoint, synth_checkpoint)
    assert out["status"] == "ok", out
    for k in ("k4", "k8"):
        assert out[k]["seconds"] > 0
        assert out[k]["speedup_vs_plain"] > 0
        assert all(0.0 <= a <= 1.0 for a in out[k]["acceptance"])
        assert all(r >= 1 for r in out[k]["rounds"])
    assert out["plain_seconds"] > 0


def test_validate_real_offline_skips(monkeypatch, tmp_path):
    """Offline, every validate_real section reports a clean skip and the
    command exits 0 (the report is always written)."""
    out_path = tmp_path / "report.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(TOOLS, "validate_real.py"),
            "--out",
            str(out_path),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    import json

    report = json.loads(out_path.read_text())
    for section in (
        "e2e_tests", "wer", "longform", "int8_wer_delta", "speculative_acceptance",
    ):  # fmt: skip
        assert report[section]["status"] == "skipped", (section, report[section])
