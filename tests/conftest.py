import os
import sys

# Virtual 8-device CPU mesh for sharding tests; must be set before jax
# initializes a backend. The axon TPU plugin ignores JAX_PLATFORMS, so the
# platform is forced via jax.config below.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))

# vendored 11 s public-domain fixture (same clip the reference tests use)
JFK = os.path.join(os.path.dirname(__file__), "data", "jfk.flac")

# oracle-parity tests run the reference implementation live; they skip
# cleanly when it isn't checked out (e.g. on a CI runner).
# WHISPER_TPU_TESTS_NO_REFERENCE=1 simulates its absence for testing that.
REFERENCE_PATH = "/root/reference"
HAS_REFERENCE = os.path.isdir(REFERENCE_PATH) and not os.environ.get(
    "WHISPER_TPU_TESTS_NO_REFERENCE"
)


def pytest_configure(config):
    config.addinivalue_line("markers", "requires_weights: needs a real checkpoint")
    config.addinivalue_line(
        "markers", "requires_reference: needs the reference repo checked out"
    )
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    if HAS_REFERENCE:
        return
    skip = pytest.mark.skip(reason=f"{REFERENCE_PATH} not available")
    for item in items:
        if "requires_reference" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def random():
    np.random.seed(42)


@pytest.fixture(scope="session")
def tiny_dims():
    from whisper_tpu.models.dims import ModelDimensions

    # head_dim must be 64: the reference hardcodes it (decoder.py:62-64)
    return ModelDimensions(
        n_mels=80,
        n_audio_ctx=1500,
        n_audio_state=128,
        n_audio_head=2,
        n_audio_layer=2,
        n_vocab=51865,
        n_text_ctx=448,
        n_text_state=128,
        n_text_head=2,
        n_text_layer=2,
    )


@pytest.fixture(scope="session")
def synth_checkpoint(tiny_dims, tmp_path_factory):
    from oracle import save_reference_checkpoint

    path = tmp_path_factory.mktemp("ckpt") / "synth.pt"
    return save_reference_checkpoint(str(path), tiny_dims, seed=11, scale=0.5)


@pytest.fixture(scope="session")
def reference_model(synth_checkpoint):
    if not HAS_REFERENCE:
        pytest.skip(f"{REFERENCE_PATH} not available")
    from oracle import load_reference_model

    return load_reference_model(synth_checkpoint)


@pytest.fixture(scope="session")
def tpu_model(synth_checkpoint):
    import whisper_tpu

    return whisper_tpu.load_model(synth_checkpoint, compute_dtype="float32")


@pytest.fixture(scope="session")
def jfk_audio():
    from whisper_tpu.audio import load_audio

    return load_audio(JFK)


@pytest.fixture(scope="session")
def jfk_flac_path():
    return str(JFK)


@pytest.fixture(scope="session")
def mesh8():
    """(dp=4, tp=2) mesh over the 8 virtual CPU devices (conftest forces
    xla_force_host_platform_device_count=8)."""
    import jax

    from whisper_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(dp=4, tp=2)
