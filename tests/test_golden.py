"""Long-form golden-transcript regression fixture.

The reference pins long-form behavior with data/meanwhile.json (a golden
transcript keyed by clip times). Real checkpoints aren't available offline,
so the equivalent here is a pinned transcript of tests/jfk.flac under the
seeded synthetic checkpoint: any change to the mel frontend, graphs,
decoding, or segmentation that shifts output breaks this test.

Regenerate (after an intentional behavior change) with:
    python tests/gen_golden.py
"""

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "jfk_synthetic_golden.json")
GOLDEN_LONG = os.path.join(
    os.path.dirname(__file__), "data", "jfk_longform_golden.json"
)


def _check_golden(tpu_model, audio, golden_path):
    with open(golden_path) as f:
        golden = json.load(f)

    res = tpu_model.transcribe(audio, verbose=None, **golden["options"])
    assert res["text"] == golden["text"]
    assert len(res["segments"]) == len(golden["segments"])
    for got, want in zip(res["segments"], golden["segments"]):
        assert got["tokens"] == want["tokens"]
        assert abs(got["start"] - want["start"]) < 1e-9
        assert abs(got["end"] - want["end"]) < 1e-9


def test_golden_long_form_transcript(tpu_model, jfk_audio):
    _check_golden(tpu_model, jfk_audio, GOLDEN)


def test_golden_multiwindow_real_audio(tpu_model, jfk_audio):
    """Real speech spanning three 30 s windows (jfk.flac x6 = 66 s): pins the
    seek loop, window-boundary timestamps, and previous-text conditioning —
    the closest offline analog of the reference's data/meanwhile.json golden."""
    import numpy as np

    from gen_golden import LONGFORM_REPEATS

    _check_golden(tpu_model, np.tile(jfk_audio, LONGFORM_REPEATS), GOLDEN_LONG)
