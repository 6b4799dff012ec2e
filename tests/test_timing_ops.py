"""DTW / median-filter property tests (cf. /root/reference/tests/test_timing.py),
plus CPU<->device equivalence for our jnp variants."""

import numpy as np
import pytest
import scipy.ndimage

from whisper_tpu.ops.dtw import dtw_jax, dtw_np
from whisper_tpu.ops.median import median_filter_jax, median_filter_np


@pytest.mark.parametrize("N, M", [(10, 20), (32, 16), (123, 1500), (234, 189)])
def test_dtw_known_path(N, M):
    """DTW over a cost matrix with a planted low-cost monotone path must
    recover that path (the reference's property test, test_timing.py:22-52):
    consecutive mismatched steps collapse into diagonal moves."""
    rng = np.random.RandomState(42)
    steps = np.concatenate([np.zeros(N - 1), np.ones(M - 1)])
    rng.shuffle(steps)
    x = rng.random((N, M)).astype(np.float32)

    i, j, k = 0, 0, 0
    trace = []
    while True:
        x[i, j] -= 1
        trace.append((i, j))

        if k == len(steps):
            break

        if k + 1 < len(steps) and steps[k] != steps[k + 1]:
            i += 1
            j += 1
            k += 2
            continue

        if steps[k] == 0:
            i += 1
        if steps[k] == 1:
            j += 1
        k += 1

    trace = np.array(trace).T
    dtw_trace = dtw_np(x)
    assert np.allclose(trace, dtw_trace)


@pytest.mark.parametrize("N, M", [(10, 20), (32, 16), (60, 200)])
def test_dtw_jax_matches_np(N, M):
    rng = np.random.RandomState(0)
    x = rng.random((N, M)).astype(np.float32)
    pn = dtw_np(x)
    pj = dtw_jax(x)
    assert np.array_equal(pn, pj)


@pytest.mark.requires_reference
def test_dtw_matches_reference_numba_semantics():
    """Bit-identical decision rule vs the reference dtw_cpu run as plain
    Python (numba stubbed)."""
    from oracle import import_reference_whisper

    import_reference_whisper()
    from whisper.timing import dtw_cpu as ref_dtw

    rng = np.random.RandomState(3)
    x = rng.random((25, 40)).astype(np.float64)
    ref_path = ref_dtw(x)
    my_path = dtw_np(x)
    assert np.array_equal(ref_path, my_path)


@pytest.mark.parametrize("shape", [(10,), (1, 15), (4, 5, 345)])
def test_median_filter(shape):
    x = np.random.random(shape).astype(np.float32)

    for filter_width in [3, 5, 7, 9]:
        filtered = median_filter_np(x, filter_width)

        # using np.pad to reflect-pad, because Scipy's reflect is
        # "symmetric" in numpy terms (the reference test does the same)
        pad_width = filter_width // 2
        padded = np.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(pad_width, pad_width)], mode="reflect"
        )
        expected = scipy.ndimage.median_filter(
            padded, [1] * (x.ndim - 1) + [filter_width]
        )[..., pad_width:-pad_width]
        assert np.allclose(filtered, expected)


def test_median_filter_equal_small_width():
    x = np.random.random((10, 2)).astype(np.float32)
    # width // 2 >= T: filter is an identity
    assert np.array_equal(median_filter_np(x, 7), x)


@pytest.mark.parametrize("shape", [(1, 15), (4, 5, 345)])
def test_median_filter_jax_matches_np(shape):
    x = np.random.random(shape).astype(np.float32)
    for filter_width in [3, 7]:
        a = median_filter_np(x, filter_width)
        b = np.asarray(median_filter_jax(x, filter_width))
        assert np.allclose(a, b, atol=1e-6)


# ---------------------------------------------------------------------------
# device-side alignment processing vs the float64 host oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_frames", [3000, 1102])
def test_device_alignment_matrix_matches_host(num_frames):
    """graphs._alignment_cost_matrix (softmax / masked z-norm / boundary-
    reflecting median filter / head mean, all on device) must match the host
    float64 pipeline it replaces — including at a segment boundary that is
    NOT the padded array edge (num_frames < 3000 exercises the dynamic
    reflect)."""
    import jax.numpy as jnp

    from whisper_tpu.models.graphs import _alignment_cost_matrix

    rng = np.random.RandomState(5)
    Hn, P, F = 6, 64, 1500
    n = 39  # valid token rows
    fv = num_frames // 2
    align = (rng.randn(Hn, P, F) * 2.0).astype(np.float32)

    # host oracle: the exact find_alignment math on the sliced array
    w = align.astype(np.float64)[:, :n, :fv]
    w = np.exp(w - w.max(axis=-1, keepdims=True))
    w = w / w.sum(axis=-1, keepdims=True)
    mean = w.mean(axis=-2, keepdims=True)
    std = w.std(axis=-2, keepdims=True)
    w = (w - mean) / std
    w = median_filter_np(w, 7)
    expected = w.mean(axis=0)  # (n, fv)

    got = np.asarray(
        _alignment_cost_matrix(
            jnp.asarray(align), jnp.int32(n), jnp.int32(fv), jnp.float32(1.0), 7
        )
    )[:n, :fv]
    assert np.abs(got - expected).max() < 1e-4


def test_find_alignment_device_matches_host(tpu_model, monkeypatch):
    """find_alignment end-to-end: the fused device replay and the host
    float64 path produce the same words with near-identical timings."""
    from whisper_tpu import timing
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, language="en", task="transcribe")
    rng = np.random.RandomState(2)
    dims = tpu_model.dims
    xa = rng.randn(1, dims.n_audio_ctx, dims.n_audio_state).astype(np.float32) * 0.3
    ck, cv = tpu_model.cross_kv(xa)
    text = tok.encode(" The quick brown fox jumps over the lazy dog.")

    monkeypatch.setenv("WHISPER_TPU_DEVICE_ALIGN", "0")
    host = timing.find_alignment(tpu_model, tok, text, 3000, ck, cv)
    monkeypatch.setenv("WHISPER_TPU_DEVICE_ALIGN", "1")
    dev = timing.find_alignment(tpu_model, tok, text, 3000, ck, cv)

    assert [t.word for t in dev] == [t.word for t in host]
    for a, b in zip(dev, host):
        assert abs(a.start - b.start) < 0.05
        assert abs(a.end - b.end) < 0.05
        assert abs(a.probability - b.probability) < 1e-3
