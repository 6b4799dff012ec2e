"""Offline graph export for the native PJRT runtime.

The reference's offline conversion (convert_encoder.py / convert_decoder.py /
convert_decoder256.py / convert_ckv.py -> .mlpackage -> coremlc) turns the
model into compiled artifacts its native runtime loads. This is the TPU
analog: jit-lower a graph to StableHLO + serialized XLA CompileOptions and
write them (plus an I/O spec manifest) to a directory that
runtime/pjrt_runner.cpp can compile and execute without Python in the loop.

    export_graph(dir, fn, example_args)       # one graph
    export_model_graphs(dir, model)           # encoder / cross_kv / prefill
"""

import json
import os
from functools import partial
from typing import Sequence

import jax
import numpy as np


def _dtype_code(dtype) -> int:
    """numpy dtype -> PJRT_Buffer_Type enum value (pjrt_c_api.h)."""
    table = {
        "int8": 2,
        "int16": 3,
        "int32": 4,
        "int64": 5,
        "uint8": 6,
        "uint16": 7,
        "uint32": 8,
        "uint64": 9,
        "float16": 10,
        "float32": 11,
        "float64": 12,
        "bfloat16": 13,
        "bool": 1,
    }
    return table[str(np.dtype(dtype) if str(dtype) != "bfloat16" else "bfloat16")]


def export_graph(
    out_dir: str,
    fn,
    example_args: Sequence,
    name: str = "graph",
    donate_argnums=(),
    n_params: int = 0,
):
    """Lower `fn(*example_args)` to StableHLO + CompileOptions + spec.json.
    `donate_argnums` marks inputs whose buffers alias outputs (the exported
    MLIR carries tf.aliasing_output attributes; the native runtime's
    execute_handles then keeps e.g. the KV cache device-resident)."""
    from jax._src.lib import xla_client

    os.makedirs(out_dir, exist_ok=True)
    # keep_unused: without it jax DCEs unused flat inputs out of the lowered
    # signature (e.g. cross_kv uses 3 of the 28 decoder leaves), silently
    # desyncing the spec + params blob from the executable's true arity —
    # executing with extra args crashes the device
    lowered = jax.jit(
        fn, donate_argnums=donate_argnums, keep_unused=True
    ).lower(*example_args)
    mlir_text = lowered.as_text(dialect="stablehlo")
    compile_options = xla_client.CompileOptions().SerializeAsString()

    out_info = lowered.out_info
    flat_out, _ = jax.tree.flatten(out_info)
    flat_in = [jax.api_util.shaped_abstractify(a) for a in jax.tree.leaves(list(example_args))]

    def itemsize(dtype) -> int:
        return 2 if str(dtype) == "bfloat16" else np.dtype(str(dtype)).itemsize

    spec = {
        "name": name,
        "n_params": n_params,
        "inputs": [
            {
                "shape": list(a.shape),
                "dtype": str(a.dtype),
                "pjrt_type": _dtype_code(a.dtype),
            }
            for a in flat_in
        ],
        "outputs": [
            {
                "shape": list(o.shape),
                "dtype": str(o.dtype),
                "pjrt_type": _dtype_code(o.dtype),
                "nbytes": int(np.prod(o.shape, dtype=np.int64)) * itemsize(o.dtype),
            }
            for o in flat_out
        ],
    }

    with open(os.path.join(out_dir, f"{name}.mlir"), "w") as f:
        f.write(mlir_text)
    with open(os.path.join(out_dir, f"{name}.compile_options.pb"), "wb") as f:
        f.write(compile_options)
    with open(os.path.join(out_dir, f"{name}.spec.json"), "w") as f:
        json.dump(spec, f, indent=1)
    with open(os.path.join(out_dir, f"{name}.spec.txt"), "w") as f:
        f.write(_spec_txt(spec))
    return spec


def _spec_txt(spec) -> str:
    """Flat text spec for the native pipeline (runtime/wtpu_transcribe.cpp
    parses this instead of JSON). One record per line:
        input  <pjrt_type> <dtype> <ndim> <dims...>
        output <pjrt_type> <dtype> <nbytes> <ndim> <dims...>
    The first `n_params` inputs are fed from <name>.params.bin."""
    lines = [f"graph {spec['name']}", f"n_params {spec.get('n_params', 0)}"]
    lines.append(f"n_inputs {len(spec['inputs'])}")
    for i in spec["inputs"]:
        dims = " ".join(str(d) for d in i["shape"])
        lines.append(f"input {i['pjrt_type']} {i['dtype']} {len(i['shape'])} {dims}".rstrip())
    lines.append(f"n_outputs {len(spec['outputs'])}")
    for o in spec["outputs"]:
        dims = " ".join(str(d) for d in o["shape"])
        lines.append(
            f"output {o['pjrt_type']} {o['dtype']} {o['nbytes']} {len(o['shape'])} {dims}".rstrip()
        )
    return "\n".join(lines) + "\n"


def _write_params_blob(out_dir: str, name: str, params) -> int:
    """Concatenate the pytree's leaves (jax.tree.leaves order — the same
    order export_graph's flat input spec uses) into <name>.params.bin."""
    path = os.path.join(out_dir, f"{name}.params.bin")
    n = 0
    with open(path, "wb") as f:
        for leaf in jax.tree.leaves(params):
            f.write(np.asarray(leaf).tobytes())
            n += 1
    return n


def export_model_graphs(out_dir: str, model, n_ctx_tokens: int = 3):
    """Export the encoder and cross-KV graphs of a model with weights baked
    in as constants (like the reference's traced .mlpackage graphs)."""
    from .models import graphs

    dims = model.dims
    enc_params = model.params["encoder"]
    dec_params = model.params["decoder"]

    mel = np.zeros((1, dims.n_mels, 3000), np.float32)
    export_graph(
        out_dir,
        partial(graphs.encode, enc_params, n_head=dims.n_audio_head),
        (mel,),
        name="encoder",
    )

    xa = jax.ShapeDtypeStruct((1, dims.n_audio_ctx, dims.n_audio_state), np.float32)
    export_graph(
        out_dir,
        partial(graphs.cross_kv, dec_params, n_head=dims.n_text_head),
        (xa,),
        name="cross_kv",
    )
    return out_dir


def export_pipeline(
    out_dir: str,
    model,
    *,
    language: str = "en",
    task: str = "transcribe",
    sample_len: int = 446,
    beam_size: int = 5,
    weights: str = "bf16",
):
    """Export everything the native transcription pipeline
    (runtime/wtpu_transcribe.cpp) needs to run WITHOUT Python:

      encoder.mlir / cross_kv.mlir / fused_greedy.mlir  (params as inputs)
      encoder.params.bin / decoder.params.bin           (weight blobs)
      suppress_mask.bin / blank_mask.bin                (default logit masks)
      <vocab>.tiktoken                                  (for native detok)
      pipeline.txt                                      (scalar manifest)

    The reference ships the same split: convert_*.py -> .mlpackage graphs +
    the tokenizer consumed by its native layer. Params are runtime inputs
    (not baked constants) so the blobs stay binary and the MLIR small."""
    import shutil

    from .engine_fused import FusedConfig, fused_decode
    from .models import graphs
    from .tokenizer import get_tokenizer

    os.makedirs(out_dir, exist_ok=True)
    dims = model.dims
    multilingual = model.is_multilingual
    tok = get_tokenizer(
        multilingual,
        num_languages=model.num_languages,
        language=language if multilingual else None,
        task=task if multilingual else None,
    )

    enc_params = model.params["encoder"]
    dec_params = model.params["decoder"]

    # ---- graphs (params as inputs) ----
    mel = jax.ShapeDtypeStruct((1, dims.n_mels, 3000), np.float32)
    n_enc = _write_params_blob(out_dir, "encoder", enc_params)
    export_graph(
        out_dir,
        partial(graphs.encode, n_head=dims.n_audio_head),
        (enc_params, mel),
        name="encoder",
        n_params=n_enc,
    )

    xa = jax.ShapeDtypeStruct((1, dims.n_audio_ctx, dims.n_audio_state), np.float32)
    n_dec = _write_params_blob(out_dir, "decoder", dec_params)
    export_graph(
        out_dir,
        partial(graphs.cross_kv, n_head=dims.n_text_head),
        (dec_params, xa),
        name="cross_kv",
        n_params=n_dec,
    )

    # ---- the fused decode graphs ----
    # weights="int8": the fused graphs consume the weight-only-quantized
    # decoder tree (quant.py) and quantize the cross-K/V inside the program
    # — the native binary needs no changes (the params blob and I/O spec
    # carry per-tensor dtypes; int8 is already in its dtype table). The
    # encoder / cross-KV graphs stay bf16 (compute-bound).
    if weights == "int8":
        from .quant import quantize_decoder

        fused_dec = quantize_decoder(dec_params)
        n_fused = _write_params_blob(out_dir, "fused_greedy", fused_dec)
    elif weights in ("", "bf16", "bfloat16"):
        fused_dec = dec_params
        n_fused = n_dec
    else:
        raise ValueError(f"unknown weights mode {weights!r} (expected 'int8')")

    cfg = FusedConfig(
        n_group=1,
        n_audio=1,
        beam_search=False,
        use_timestamps=True,
        max_candidates=0,
        eot=tok.eot,
        timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech if tok.no_speech is not None else 0,
        quantize_ckv=weights == "int8",
    )
    ck_aval, cv_aval = jax.eval_shape(
        partial(graphs.cross_kv, n_head=dims.n_text_head), dec_params, xa
    )
    example = (
        fused_dec,
        jax.ShapeDtypeStruct((1, graphs.CACHE_SLOTS), np.int32),  # initial tokens
        np.int32(0),  # sample_begin
        jax.ShapeDtypeStruct(ck_aval.shape, ck_aval.dtype),
        jax.ShapeDtypeStruct(cv_aval.shape, cv_aval.dtype),
        np.int32(0),  # sot_index
        jax.ShapeDtypeStruct((dims.n_vocab,), np.bool_),  # suppress
        jax.ShapeDtypeStruct((dims.n_vocab,), np.bool_),  # blank
        np.int32(0),  # max_initial_ts_index
        np.int32(0),  # sample_len
        np.float32(0),  # temperature
        np.int32(0),  # rng_seed
    )
    export_graph(
        out_dir,
        partial(
            fused_decode,
            n_head=dims.n_text_head,
            cfg=cfg,
            cache_dtype=model.compute_dtype,
        ),
        example,
        name="fused_greedy",
        n_params=n_fused,
    )
    # ---- the fused beam-search decode graph ----
    beam_cfg = cfg._replace(
        n_group=beam_size, beam_search=True, max_candidates=beam_size
    )
    export_graph(
        out_dir,
        partial(
            fused_decode,
            n_head=dims.n_text_head,
            cfg=beam_cfg,
            cache_dtype=model.compute_dtype,
        ),
        example,
        name="fused_beam",
        n_params=n_fused,
    )
    # the fused graphs share one decoder blob: the bf16 one when unquantized,
    # the int8 blob written above otherwise
    fused_blob = "decoder.params.bin" if weights != "int8" else "fused_greedy.params.bin"
    for shared in ("fused_greedy", "fused_beam"):
        link = os.path.join(out_dir, f"{shared}.params.bin")
        if not os.path.exists(link):
            os.symlink(fused_blob, link)

    # ---- default suppression masks (DecodingTask._get_suppress_tokens with
    # suppress_tokens="-1": non-speech tokens + specials; SuppressBlank) ----
    suppress = sorted(
        set(
            list(tok.non_speech_tokens)
            + [tok.transcribe, tok.translate, tok.sot, tok.sot_prev, tok.sot_lm]
            + ([tok.no_speech] if tok.no_speech is not None else [])
        )
    )
    smask = np.zeros(dims.n_vocab, np.bool_)
    smask[suppress] = True
    bmask = np.zeros(dims.n_vocab, np.bool_)
    bmask[tok.encode(" ") + [tok.eot]] = True
    smask.tofile(os.path.join(out_dir, "suppress_mask.bin"))
    bmask.tofile(os.path.join(out_dir, "blank_mask.bin"))

    # ---- tokenizer asset + manifest ----
    vocab = "multilingual" if multilingual else "gpt2"
    shutil.copy(
        os.path.join(os.path.dirname(__file__), "assets", f"{vocab}.tiktoken"),
        os.path.join(out_dir, f"{vocab}.tiktoken"),
    )
    initial = list(tok.sot_sequence)
    manifest = [
        f"n_mels {dims.n_mels}",
        "sample_rate 16000",
        f"n_vocab {dims.n_vocab}",
        f"n_text_tokens {tok.eot}",  # ids < eot are plain text tokens
        f"eot {tok.eot}",
        f"timestamp_begin {tok.timestamp_begin}",
        f"sot_index 0",
        f"sample_begin {len(initial)}",
        f"sample_len {sample_len}",
        f"max_initial_ts_index 50",
        f"beam_size {beam_size}",
        f"tiktoken {vocab}.tiktoken",
        "initial_tokens " + " ".join(str(t) for t in initial),
    ]
    with open(os.path.join(out_dir, "pipeline.txt"), "w") as f:
        f.write("\n".join(manifest) + "\n")
    return out_dir
