"""Regenerate tests/data/jfk_synthetic_golden.json (see test_golden.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")

from oracle import save_reference_checkpoint  # noqa: E402

import whisper_tpu  # noqa: E402
from whisper_tpu.models.dims import ModelDimensions  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "data", "jfk_synthetic_golden.json")
OUT_LONG = os.path.join(
    os.path.dirname(__file__), "data", "jfk_longform_golden.json"
)
LONGFORM_REPEATS = 6  # 6 x 11 s = 66 s: three 30 s seek windows of real speech


def main():
    import numpy as np

    dims = ModelDimensions(80, 1500, 128, 2, 2, 51865, 448, 128, 2, 2)
    ckpt = save_reference_checkpoint("/tmp/golden_ckpt.pt", dims, seed=11, scale=0.5)
    model = whisper_tpu.load_model(ckpt, compute_dtype="float32")
    audio = whisper_tpu.load_audio(os.path.join(os.path.dirname(__file__), "data", "jfk.flac"))
    res = model.transcribe(audio, language="en", temperature=0.0, verbose=None)
    golden = {
        "checkpoint": {"dims": dims.__dict__, "seed": 11, "scale": 0.5},
        "audio": "jfk.flac",
        "options": {"language": "en", "temperature": 0.0},
        "text": res["text"],
        "segments": [
            {"start": s["start"], "end": s["end"], "tokens": s["tokens"]}
            for s in res["segments"]
        ],
    }
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {OUT}: {len(res['segments'])} segments")

    # Long-form variant: real speech audio spanning multiple 30 s windows, so
    # the seek loop, window boundaries, and condition-on-previous-text carry
    # are all pinned (the reference pins this with data/meanwhile.json).
    long_audio = np.tile(audio, LONGFORM_REPEATS)
    res = model.transcribe(long_audio, language="en", temperature=0.0, verbose=None)
    golden = {
        "checkpoint": {"dims": dims.__dict__, "seed": 11, "scale": 0.5},
        "audio": f"jfk.flac x{LONGFORM_REPEATS}",
        "options": {"language": "en", "temperature": 0.0},
        "text": res["text"],
        "segments": [
            {"start": s["start"], "end": s["end"], "tokens": s["tokens"]}
            for s in res["segments"]
        ],
    }
    with open(OUT_LONG, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {OUT_LONG}: {len(res['segments'])} segments")


if __name__ == "__main__":
    main()
