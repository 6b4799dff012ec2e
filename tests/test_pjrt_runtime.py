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
        return jnp.dot(a, b) + 1.0

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
