"""Pipeline-parallel encoder (parallel/pipeline.py) on the virtual 8-device
CPU mesh: GPipe stage flow + microbatching + in-stage tensor parallelism
must reproduce the single-device graphs.encode bit-for-bit (pp moves whole
layers across devices; only the tp psum reorders float adds)."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def deep_model():
    """4 encoder layers so pp in {2, 4} divides the stack (the session-wide
    tiny_dims has only 2)."""
    from whisper_tpu.models import Whisper
    from whisper_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(
        n_mels=80,
        n_audio_ctx=100,
        n_audio_state=256,  # 4 heads x the reference's hardcoded dh=64
        n_audio_head=4,
        n_audio_layer=4,
        n_vocab=51865,
        n_text_ctx=448,
        n_text_state=128,
        n_text_head=2,
        n_text_layer=2,
    )
    return Whisper(dims, params=None, name="pp-test", compute_dtype="float32")


@pytest.fixture(scope="module")
def mel(deep_model):
    rng = np.random.RandomState(5)
    d = deep_model.dims
    return (rng.randn(8, d.n_mels, 2 * d.n_audio_ctx) * 0.5).astype(np.float32)


@pytest.fixture(scope="module")
def xa_ref(deep_model, mel):
    return np.asarray(deep_model.encode(mel))


def _mesh_or_skip(**kw):
    from whisper_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(**kw)


@pytest.mark.parametrize(
    "mesh_kw,microbatches",
    [
        (dict(dp=2, pp=4), 0),  # default microbatches = pp
        (dict(dp=2, pp=4), 1),  # degenerate single microbatch (pure bubble)
        (dict(dp=1, pp=2, tp=4), 2),  # tp psum inside each stage
        (dict(dp=2, pp=2, tp=2), 4),  # all three axes at once
    ],
)
def test_pp_encode_matches_single_device(deep_model, mel, xa_ref, mesh_kw, microbatches):
    from whisper_tpu.parallel.pipeline import pp_encode

    mesh = _mesh_or_skip(**mesh_kw)
    fn = pp_encode(deep_model, mesh, microbatches=microbatches)
    xa = np.asarray(fn(deep_model.params["encoder"], mel))
    assert xa.shape == xa_ref.shape
    np.testing.assert_allclose(xa, xa_ref, atol=2e-5, rtol=1e-5)


def test_pp_encode_rejects_indivisible_layers(deep_model):
    """pp must divide the layer stack — a silent mis-split would drop layers."""
    from whisper_tpu.parallel.pipeline import pp_encode

    mesh = _mesh_or_skip(dp=1, pp=8)
    with pytest.raises(AssertionError, match="not divisible by pp"):
        pp_encode(deep_model, mesh)


def test_make_mesh_pp_axis_order():
    """(dp, pp, tp) axis order: tp innermost, dp outermost; 2-axis meshes
    unchanged when pp == 1."""
    mesh = _mesh_or_skip(dp=2, pp=2, tp=2)
    assert mesh.axis_names == ("dp", "pp", "tp")
    assert dict(mesh.shape) == {"dp": 2, "pp": 2, "tp": 2}
    mesh2 = _mesh_or_skip(dp=4, tp=2)
    assert mesh2.axis_names == ("dp", "tp")


@pytest.mark.parametrize(
    "mesh_kw",
    [
        dict(dp=2, sp=4),                # deep sequence split (25 frames/rank)
        dict(dp=2, sp=2, tp=2),          # all three axes at once
        dict(dp=4, sp=2),                # sp composes with dp
    ],
)
def test_sp_encode_matches_single_device(deep_model, mel, xa_ref, mesh_kw):
    """Sequence-parallel encoder (parallel/sequence.py): frames sharded over
    sp with per-layer K/V all-gathers must reproduce graphs.encode."""
    from whisper_tpu.parallel.sequence import sp_encode

    mesh = _mesh_or_skip(**mesh_kw)
    fn = sp_encode(deep_model, mesh)
    xa = np.asarray(fn(deep_model.params["encoder"], mel))
    assert xa.shape == xa_ref.shape
    np.testing.assert_allclose(xa, xa_ref, atol=2e-5, rtol=1e-5)


def test_sp_encode_rejects_indivisible_frames(deep_model):
    """T=100 frames, sp=8: a silent uneven shard would corrupt positions."""
    from whisper_tpu.parallel.mesh import make_mesh
    from whisper_tpu.parallel.sequence import sp_encode

    mesh = _mesh_or_skip(dp=1, sp=8)
    fn = sp_encode(deep_model, mesh)
    with pytest.raises(Exception, match="not divisible by sp"):
        fn(deep_model.params["encoder"],
           np.zeros((8, 80, 200), np.float32))


def test_make_mesh_sp_axis_order():
    """(dp, pp, sp, tp): sp sits between pp and tp."""
    mesh = _mesh_or_skip(dp=1, pp=2, sp=2, tp=2)
    assert mesh.axis_names == ("dp", "pp", "sp", "tp")
    mesh2 = _mesh_or_skip(dp=4, sp=2)
    assert mesh2.axis_names == ("dp", "sp", "tp")
    assert dict(mesh2.shape) == {"dp": 4, "sp": 2, "tp": 1}
