"""Native C++ PJRT runtime (runtime/pjrt_runner.cpp) end-to-end test.

Opt-in: creates its own TPU client (claiming the chip), so it only runs when
WHISPER_TPU_PJRT_TEST=1 and the axon plugin exists. The export format itself
is validated everywhere.
"""

import json
import os

import numpy as np
import pytest

PLUGIN = "/opt/axon/libaxon_pjrt.so"


def test_export_graph_format(tmp_path, tiny_dims):
    import jax.numpy as jnp

    from whisper_tpu.export import export_graph

    def f(a):
        return a * 2.0 + 1.0

    a = np.zeros((4, 8), np.float32)
    spec = export_graph(str(tmp_path), f, (a,), name="double")
    assert (tmp_path / "double.mlir").exists()
    assert (tmp_path / "double.compile_options.pb").stat().st_size > 0
    loaded = json.loads((tmp_path / "double.spec.json").read_text())
    assert loaded["inputs"][0]["shape"] == [4, 8]
    assert loaded["outputs"][0]["dtype"] == "float32"
    assert loaded["outputs"][0]["nbytes"] == 4 * 8 * 4
    assert "stablehlo" in (tmp_path / "double.mlir").read_text()


def test_export_model_graphs(tmp_path, tpu_model):
    from whisper_tpu.export import export_model_graphs

    export_model_graphs(str(tmp_path), tpu_model)
    for name in ("encoder", "cross_kv"):
        assert (tmp_path / f"{name}.mlir").exists()
        spec = json.loads((tmp_path / f"{name}.spec.json").read_text())
        assert spec["outputs"], name


@pytest.mark.skipif(
    not (os.path.exists(PLUGIN) and os.environ.get("WHISPER_TPU_PJRT_TEST")),
    reason="needs the TPU PJRT plugin and WHISPER_TPU_PJRT_TEST=1 (claims the chip)",
)
def test_native_runtime_executes(tmp_path):
    import jax.numpy as jnp

    from whisper_tpu.export import export_graph
    from whisper_tpu.runtime.pjrt import PjrtRunner, default_axon_options

    def f(a, b):
        # 'highest' is baked into the exported StableHLO: on TPU the f32
        # default decomposes into bf16 MXU passes (~1e-1 abs error at this
        # scale), which is fine for the model but not for a 1e-3 exactness
        # check against numpy
        return jnp.dot(a, b, precision="highest") + 1.0

    a = np.random.RandomState(0).randn(64, 64).astype(np.float32)
    b = np.random.RandomState(1).randn(64, 64).astype(np.float32)
    export_graph(str(tmp_path), f, (a, b), name="mm")

    runner = PjrtRunner(PLUGIN, default_axon_options())
    try:
        assert runner.device_count >= 1
        runner.load_graph(str(tmp_path), "mm")
        (out,) = runner.execute("mm", [a, b])
        assert np.abs(out - (a @ b + 1.0)).max() < 1e-3
    finally:
        runner.close()


@pytest.mark.skipif(
    not (os.path.exists(PLUGIN) and os.environ.get("WHISPER_TPU_PJRT_TEST")),
    reason="needs the TPU PJRT plugin and WHISPER_TPU_PJRT_TEST=1 (claims the chip)",
)
def test_native_persistent_kv_cache(tmp_path, tpu_model):
    """The arrayMKV448 story: a donated-cache decode step executed natively
    with the KV cache living on device across calls."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from whisper_tpu.export import export_graph
    from whisper_tpu.models import graphs
    from whisper_tpu.runtime.pjrt import PjrtRunner, default_axon_options

    dims = tpu_model.dims
    dec = jax.tree.map(np.asarray, tpu_model.params["decoder"])  # f32 host copy

    def step(cache, tokens, pos):
        logits, cache = graphs.decode_step(
            dec,
            tokens,
            pos,
            cache,
            jnp.arange(1, dtype=jnp.int32),
            ck,
            cv,
            n_head=dims.n_text_head,
        )
        return cache, logits

    # features + cross KV (computed in-process, fed as constants to the export)
    mel = (np.random.RandomState(0).randn(1, 80, 3000) * 0.5).astype(np.float32)
    import whisper_tpu

    xa = np.asarray(tpu_model.encode(mel))
    ck, cv = jax.tree.map(np.asarray, tpu_model.cross_kv(jnp.asarray(xa)))

    cache0 = np.zeros(
        (dims.n_text_layer, 2, 1, graphs.CACHE_SLOTS, dims.n_text_state), np.float32
    )
    tok0 = np.array([50258], np.int32)
    pos0 = np.int32(0)

    export_graph(
        str(tmp_path),
        step,
        (cache0, tok0, pos0),
        name="step_donated",
        donate_argnums=(0,),
    )

    runner = PjrtRunner(PLUGIN, default_axon_options())
    try:
        runner.load_graph(str(tmp_path), "step_donated")
        cache_h = runner.buffer_from_host(cache0)
        toks = [50258, 50259, 50359, 123]
        native_logits = None
        for i, t in enumerate(toks):
            tok_h = runner.buffer_from_host(np.array([t], np.int32))
            pos_h = runner.buffer_from_host(np.array(i, np.int32))
            cache_h, logits_h = runner.execute_handles(
                "step_donated", [cache_h, tok_h, pos_h]
            )
            native_logits = runner.to_host(logits_h)
            runner.destroy_buffer(logits_h)

        # in-process reference with the same weights
        cache = jnp.asarray(cache0)
        for i, t in enumerate(toks):
            cache, logits = jax.jit(step, donate_argnums=(0,))(
                cache, np.array([t], np.int32), np.int32(i)
            )
        expect = np.asarray(logits)
        assert np.abs(native_logits - expect).max() < 0.1  # MXU default precision
        assert np.argmax(native_logits) == np.argmax(expect)
    finally:
        runner.close()
