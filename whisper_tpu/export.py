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
    out_dir: str, fn, example_args: Sequence, name: str = "graph", donate_argnums=()
):
    """Lower `fn(*example_args)` to StableHLO + CompileOptions + spec.json.
    `donate_argnums` marks inputs whose buffers alias outputs (the exported
    MLIR carries tf.aliasing_output attributes; the native runtime's
    execute_handles then keeps e.g. the KV cache device-resident)."""
    from jax._src.lib import xla_client

    os.makedirs(out_dir, exist_ok=True)
    lowered = jax.jit(fn, donate_argnums=donate_argnums).lower(*example_args)
    mlir_text = lowered.as_text(dialect="stablehlo")
    compile_options = xla_client.CompileOptions().SerializeAsString()

    out_info = lowered.out_info
    flat_out, _ = jax.tree.flatten(out_info)
    flat_in = [jax.api_util.shaped_abstractify(a) for a in jax.tree.leaves(list(example_args))]

    def itemsize(dtype) -> int:
        return 2 if str(dtype) == "bfloat16" else np.dtype(str(dtype)).itemsize

    spec = {
        "name": name,
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
    return spec


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
