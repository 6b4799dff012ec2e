"""export_pipeline format + the native wtpu_transcribe binary.

The format tests run everywhere (CPU). The end-to-end binary test is opt-in
(WHISPER_TPU_PJRT_TEST=1): it claims the TPU chip, runs the C++ pipeline on
jfk.flac, and pins token-for-token parity with the Python fused engine
(validated manually on 2026-08-16: 445/445 tokens identical)."""

import os
import re
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARY = os.path.join(REPO, "whisper_tpu", "runtime", "wtpu_transcribe")
JFK = os.path.join(os.path.dirname(__file__), "data", "jfk.flac")


@pytest.fixture(scope="module")
def pipeline_dir(tpu_model, tmp_path_factory):
    from whisper_tpu.export import export_pipeline

    out = tmp_path_factory.mktemp("pipeline")
    export_pipeline(str(out), tpu_model)
    return str(out)


def _mlir_arity(path):
    text = open(path).read()
    sig = text.split("func.func", 1)[1].split("->", 1)[0]
    return len(re.findall(r"%arg\d+:", sig))


def test_pipeline_files(pipeline_dir):
    for f in (
        "encoder.mlir", "cross_kv.mlir", "fused_greedy.mlir",
        "encoder.params.bin", "decoder.params.bin",
        "suppress_mask.bin", "blank_mask.bin", "pipeline.txt",
        "multilingual.tiktoken",
    ):  # fmt: skip
        assert os.path.exists(os.path.join(pipeline_dir, f)), f


@pytest.mark.parametrize("name", ["encoder", "cross_kv", "fused_greedy", "fused_beam"])
def test_spec_matches_mlir_arity(pipeline_dir, name):
    """keep_unused regression: jax DCE'd unused params out of the lowered
    signature, desyncing spec + blob from the executable (device crash)."""
    import json

    spec = json.load(open(os.path.join(pipeline_dir, f"{name}.spec.json")))
    arity = _mlir_arity(os.path.join(pipeline_dir, f"{name}.mlir"))
    assert len(spec["inputs"]) == arity


def test_params_blob_sizes(pipeline_dir):
    import json

    import ml_dtypes

    for name, blob in (("encoder", "encoder"), ("cross_kv", "decoder")):
        spec = json.load(open(os.path.join(pipeline_dir, f"{name}.spec.json")))
        total = 0
        for i in spec["inputs"][: spec["n_params"]]:
            dt = (
                np.dtype(ml_dtypes.bfloat16)
                if i["dtype"] == "bfloat16"
                else np.dtype(i["dtype"])
            )
            total += int(np.prod(i["shape"], dtype=np.int64)) * dt.itemsize
        assert os.path.getsize(os.path.join(pipeline_dir, f"{blob}.params.bin")) == total


def test_spec_txt_roundtrip(pipeline_dir):
    """spec.txt (parsed by C++) agrees with spec.json."""
    import json

    for name in ("encoder", "cross_kv", "fused_greedy", "fused_beam"):
        spec = json.load(open(os.path.join(pipeline_dir, f"{name}.spec.json")))
        txt = open(os.path.join(pipeline_dir, f"{name}.spec.txt")).read().splitlines()
        n_inputs = int([l for l in txt if l.startswith("n_inputs")][0].split()[1])
        assert n_inputs == len(spec["inputs"])
        in_lines = [l for l in txt if l.startswith("input ")]
        for line, ispec in zip(in_lines, spec["inputs"]):
            parts = line.split()
            assert int(parts[1]) == ispec["pjrt_type"]
            assert parts[2] == ispec["dtype"]
            assert [int(d) for d in parts[4:]] == ispec["shape"]


@pytest.mark.skipif(
    not (
        os.path.exists(BINARY)
        and os.path.exists(JFK)
        and os.environ.get("WHISPER_TPU_PJRT_TEST")
    ),
    reason="needs the built binary, jfk.flac and WHISPER_TPU_PJRT_TEST=1 (claims the chip)",
)
def test_native_binary_matches_python(pipeline_dir, tpu_model):
    res = subprocess.run(
        # --no-fallback pins t=0: with random weights the quality gates
        # (compression ratio / avg logprob) routinely trip and the ladder
        # would re-decode with SAMPLING, which cannot match a greedy run
        [BINARY, pipeline_dir, JFK, "--tokens", "--max-windows", "1",
         "--no-fallback"],
        # errors="replace": the transcript the binary prints is detokenized
        # from RANDOM-weight tokens, which routinely form invalid UTF-8
        capture_output=True, text=True, errors="replace", timeout=1800,
    )  # fmt: skip
    assert res.returncode == 0, res.stderr
    tok_lines = [
        l for l in res.stderr.splitlines() if re.fullmatch(r"[\d ]+", l.strip()) and l.strip()
    ]
    native = [int(t) for t in tok_lines[0].split()]

    from whisper_tpu.audio import load_audio
    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.runtime.native import log_mel_native

    pdir = pipeline_dir
    smask = np.fromfile(os.path.join(pdir, "suppress_mask.bin"), dtype=bool)
    bmask = np.fromfile(os.path.join(pdir, "blank_mask.bin"), dtype=bool)
    manifest = dict(
        line.split(None, 1) for line in open(os.path.join(pdir, "pipeline.txt"))
    )
    initial = [int(t) for t in manifest["initial_tokens"].split()]

    audio = load_audio(JFK)
    # the SAME mel bytes the binary computes (audioio.cpp): with random
    # weights, greedy argmax is knife-edge — even ~1e-7 host-vs-native mel
    # differences can flip a token and cascade
    mel = log_mel_native(audio, tpu_model.dims.n_mels, padding=480000)[:, :3000]
    xa = tpu_model.encode(np.asarray(mel)[None])
    ck, cv = tpu_model.cross_kv(xa)
    out = FusedEngine(tpu_model).run(
        initial, ck, cv, sot_index=0,
        suppress_ids=np.nonzero(smask)[0].tolist(),
        blank_ids=np.nonzero(bmask)[0].tolist(),
        max_initial_ts_index=int(manifest["max_initial_ts_index"]),
        sample_len=int(manifest["sample_len"]), n_group=1, beam_search=False,
        max_candidates=0, use_timestamps=True, temperature=0.0,
        eot=int(manifest["eot"]), timestamp_begin=int(manifest["timestamp_begin"]),
        no_timestamps=int(manifest["timestamp_begin"]) - 1,
        no_speech=50363, rng_seed=0,
    )  # fmt: skip
    toks, n = out[0], int(out[1])
    python = [int(t) for t in toks[0, len(initial) : n]]
    assert native == python


@pytest.fixture(scope="module")
def int8_pipeline_dir(tpu_model, tmp_path_factory):
    from whisper_tpu.export import export_pipeline

    out = tmp_path_factory.mktemp("pipeline_i8")
    export_pipeline(str(out), tpu_model, weights="int8")
    return str(out)


def test_pipeline_int8_format(int8_pipeline_dir):
    """weights='int8' export: the fused graphs consume the quantized decoder
    tree (int8 weights + '@scale' leaves in the blob/spec); encoder/cross_kv
    stay bf16; the binary needs no changes (per-tensor dtypes in the spec)."""
    import json

    import ml_dtypes

    pdir = int8_pipeline_dir
    spec = json.load(open(os.path.join(pdir, "fused_greedy.spec.json")))
    dtypes = [i["dtype"] for i in spec["inputs"][: spec["n_params"]]]
    assert "int8" in dtypes  # quantized weights present
    assert any(d == "float32" for d in dtypes)  # their scales
    # blob size must match the spec exactly (same invariant as bf16)
    total = 0
    for i in spec["inputs"][: spec["n_params"]]:
        dt = (
            np.dtype(ml_dtypes.bfloat16)
            if i["dtype"] == "bfloat16"
            else np.dtype(i["dtype"])
        )
        total += int(np.prod(i["shape"], dtype=np.int64)) * dt.itemsize
    blob = os.path.realpath(os.path.join(pdir, "fused_greedy.params.bin"))
    assert os.path.getsize(blob) == total
    # the int8 blob is smaller than the bf16 decoder blob
    assert os.path.getsize(blob) < os.path.getsize(
        os.path.join(pdir, "decoder.params.bin")
    )
    # encoder / cross_kv stay unquantized
    enc_spec = json.load(open(os.path.join(pdir, "encoder.spec.json")))
    assert all(
        i["dtype"] != "int8" for i in enc_spec["inputs"][: enc_spec["n_params"]]
    )


@pytest.mark.skipif(
    not (
        os.path.exists(BINARY)
        and os.path.exists(JFK)
        and os.environ.get("WHISPER_TPU_PJRT_TEST")
    ),
    reason="needs the built binary, jfk.flac and WHISPER_TPU_PJRT_TEST=1 (claims the chip)",
)
def test_native_binary_int8_matches_python(int8_pipeline_dir, synth_checkpoint):
    """The int8 native pipeline is token-identical to the Python int8
    engine ON THE SAME BACKEND. The Python reference runs on the TPU in a
    child process (this test process forces the CPU backend, and the int8
    path's bf16 dots accumulate in a backend-specific order — a CPU-vs-TPU
    comparison diverged at a knife-edge argmax around token ~300 with
    random weights; bf16-vs-bf16 on the same chip must match exactly)."""
    import sys

    res = subprocess.run(
        [BINARY, int8_pipeline_dir, JFK, "--tokens", "--max-windows", "1",
         "--no-fallback"],
        capture_output=True, text=True, errors="replace", timeout=1800,
    )  # fmt: skip
    assert res.returncode == 0, res.stderr
    tok_lines = [
        l for l in res.stderr.splitlines() if re.fullmatch(r"[\d ]+", l.strip()) and l.strip()
    ]
    native = [int(t) for t in tok_lines[0].split()]

    child = rf"""
import json, os, sys
import numpy as np
sys.path.insert(0, {REPO!r})
import whisper_tpu
from whisper_tpu.audio import load_audio
from whisper_tpu.engine_fused import FusedEngine
from whisper_tpu.runtime.native import log_mel_native

pdir = {int8_pipeline_dir!r}
model = whisper_tpu.load_model({synth_checkpoint!r}, compute_dtype="float32")

# Rebuild the quantized decoder tree from the EXPORTED blob: re-quantizing
# here would run on the TPU, and f32 division is not correctly rounded
# there — a handful of weights land one quantum off vs the CPU-exported
# blob, enough to flip knife-edge argmaxes with random weights. The blob
# bytes ARE what the binary runs; byte-identical inputs or it isn't parity.
import jax
import jax.numpy as jnp
import ml_dtypes
from whisper_tpu.quant import quantize_decoder

qdec_struct = quantize_decoder(model.params["decoder"])
leaves, treedef = jax.tree.flatten(qdec_struct)
spec = json.load(open(os.path.join(pdir, "fused_greedy.spec.json")))
raw = open(os.path.realpath(os.path.join(pdir, "fused_greedy.params.bin")), "rb").read()
off, new_leaves = 0, []
for ispec in spec["inputs"][: spec["n_params"]]:
    dt = np.dtype(ml_dtypes.bfloat16) if ispec["dtype"] == "bfloat16" else np.dtype(ispec["dtype"])
    nbytes = int(np.prod(ispec["shape"], dtype=np.int64)) * dt.itemsize
    new_leaves.append(jnp.asarray(np.frombuffer(raw[off:off + nbytes], dtype=dt).reshape(ispec["shape"])))
    off += nbytes
assert len(new_leaves) == len(leaves), (len(new_leaves), len(leaves))
qdec = jax.tree.unflatten(treedef, new_leaves)

smask = np.fromfile(os.path.join(pdir, "suppress_mask.bin"), dtype=bool)
bmask = np.fromfile(os.path.join(pdir, "blank_mask.bin"), dtype=bool)
manifest = dict(line.split(None, 1) for line in open(os.path.join(pdir, "pipeline.txt")))
initial = [int(t) for t in manifest["initial_tokens"].split()]
audio = load_audio({JFK!r})
mel = log_mel_native(audio, model.dims.n_mels, padding=480000)[:, :3000]
xa = model.encode(np.asarray(mel)[None])
ck, cv = model.cross_kv(xa)
eng = FusedEngine(model, weights="int8")
eng._dec_params = qdec  # inject the exported blob's exact quantized weights
out = eng.run(
    initial, ck, cv, sot_index=0,
    suppress_ids=np.nonzero(smask)[0].tolist(),
    blank_ids=np.nonzero(bmask)[0].tolist(),
    max_initial_ts_index=int(manifest["max_initial_ts_index"]),
    sample_len=int(manifest["sample_len"]), n_group=1, beam_search=False,
    max_candidates=0, use_timestamps=True, temperature=0.0,
    eot=int(manifest["eot"]), timestamp_begin=int(manifest["timestamp_begin"]),
    no_timestamps=int(manifest["timestamp_begin"]) - 1,
    no_speech=50363, rng_seed=0,
)
toks, n = np.asarray(out[0]), int(out[1])
print("TOKENS " + " ".join(str(int(t)) for t in toks[0, len(initial):n]))
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # run on the real TPU like the binary
    proc = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("TOKENS")][0]
    python = [int(t) for t in line.split()[1:]]
    assert native == python
