"""Multi-device sharding on the virtual 8-device CPU mesh: tp param
placement, dp+tp batched inference == single-device fused engine, sharded
encoder/cross-KV parity."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P


def test_param_shardings_tp_rules(tpu_model, mesh8):
    from whisper_tpu.parallel.sharding import shard_params

    sharded = shard_params(tpu_model.params["decoder"], mesh8)
    q = sharded["blocks"]["attn_q_w"]  # (L, d, d) sharded on out axis
    assert q.sharding.spec == P(None, None, "tp")
    o = sharded["blocks"]["attn_o_w"]
    assert o.sharding.spec == P(None, "tp", None)
    emb = sharded["tok_emb"]
    assert emb.sharding.spec == P()


def test_dp_engine_matches_single_device(tpu_model, mesh8):
    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.parallel.serve import DataParallelEngine, dp_cross_kv, dp_encode

    A = 4
    rng = np.random.RandomState(3)
    mel = (rng.randn(A, tpu_model.dims.n_mels, 3000) * 0.5).astype(np.float32)

    xa_ref = tpu_model.encode(mel)
    ck_ref, cv_ref = tpu_model.cross_kv(xa_ref)

    enc = dp_encode(tpu_model, mesh8)
    ckv = dp_cross_kv(tpu_model, mesh8)
    xa = enc(tpu_model.params["encoder"], mel)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xa_ref), atol=2e-5)
    ck, cv = ckv(tpu_model.params["decoder"], xa)
    np.testing.assert_allclose(np.asarray(ck), np.asarray(ck_ref), atol=2e-5)

    kwargs = dict(
        sot_index=0, suppress_ids=[11, 220], blank_ids=[220, 50257],
        max_initial_ts_index=50, sample_len=12, n_group=2, beam_search=True,
        max_candidates=2, use_timestamps=True, temperature=0.0,
        eot=50257, timestamp_begin=50365, no_timestamps=50364,
        no_speech=50363, rng_seed=0,
    )  # fmt: skip
    initial = np.tile(np.array([[50258, 50259, 50359]], np.int32), (A, 1))

    ref = FusedEngine(tpu_model).run(initial, ck_ref, cv_ref, **kwargs)
    dp = DataParallelEngine(tpu_model, mesh8).run(initial, ck, cv, **kwargs)

    n = int(ref[1])
    assert int(dp[1]) == n
    assert np.array_equal(np.asarray(dp[0])[:, :n], np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(dp[2]), np.asarray(ref[2]), atol=1e-4)
    assert np.array_equal(np.asarray(dp[7]), np.asarray(ref[7]))  # fcount


def test_dp_engine_indivisible_batch_falls_back_unsharded(tpu_model, mesh8):
    """A batch the mesh can't split (transcribe()'s per-window n_audio=1
    fallback under a dp>1 mesh) compiles without sharding annotations —
    correct output, just not distributed."""
    from whisper_tpu.engine_fused import FusedConfig, FusedEngine
    from whisper_tpu.parallel.serve import DataParallelEngine

    eng = DataParallelEngine(tpu_model, mesh8)
    cfg = FusedConfig(
        n_group=1, n_audio=3, beam_search=False, use_timestamps=True,
        max_candidates=0, eot=50257, timestamp_begin=50365,
        no_timestamps=50364, no_speech=50363,
    )  # fmt: skip
    assert eng._jit_options(cfg) == {}

    A = 3
    rng = np.random.RandomState(7)
    mel = (rng.randn(A, tpu_model.dims.n_mels, 3000) * 0.5).astype(np.float32)
    ck, cv = tpu_model.cross_kv(tpu_model.encode(mel))
    kwargs = dict(
        sot_index=0, suppress_ids=[11, 220], blank_ids=[220, 50257],
        max_initial_ts_index=50, sample_len=8, n_group=1, beam_search=False,
        max_candidates=0, use_timestamps=True, temperature=0.0,
        eot=50257, timestamp_begin=50365, no_timestamps=50364,
        no_speech=50363, rng_seed=0,
    )  # fmt: skip
    initial = np.tile(np.array([[50258, 50259, 50359]], np.int32), (A, 1))
    ref = FusedEngine(tpu_model).run(initial, ck, cv, **kwargs)
    dp = eng.run(initial, ck, cv, **kwargs)
    n = int(ref[1])
    assert int(dp[1]) == n
    assert np.array_equal(np.asarray(dp[0])[:, :n], np.asarray(ref[0])[:, :n])


def test_dp_engine_int8_matches_single_device_int8(tpu_model, mesh8):
    """Weight-only int8 decode under GSPMD: the sharded engine must produce
    the exact tokens of the single-device int8 engine (same program
    semantics; the '@scale' leaves ride the sharding tree — serve.py builds
    in_shardings from the quantized tree)."""
    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.parallel.serve import DataParallelEngine

    A = 4
    L, H = tpu_model.dims.n_text_layer, tpu_model.dims.n_text_head
    dh = tpu_model.dims.n_text_state // H
    rng = np.random.RandomState(9)
    ck = np.asarray(
        rng.randn(L, A, H, dh, tpu_model.dims.n_audio_ctx) * 0.2, np.float32
    )
    cv = np.asarray(
        rng.randn(L, A, H, dh, tpu_model.dims.n_audio_ctx) * 0.2, np.float32
    )
    kwargs = dict(
        sot_index=0, suppress_ids=[11, 220], blank_ids=[220, 50257],
        max_initial_ts_index=50, sample_len=10, n_group=2, beam_search=True,
        max_candidates=2, use_timestamps=True, temperature=0.0,
        eot=50257, timestamp_begin=50365, no_timestamps=50364,
        no_speech=50363, rng_seed=0,
    )  # fmt: skip
    initial = np.tile(np.array([[50258, 50259, 50359]], np.int32), (A, 1))

    ref = FusedEngine(tpu_model, weights="int8").run(initial, ck, cv, **kwargs)
    dp = DataParallelEngine(tpu_model, mesh8, weights="int8").run(
        initial, ck, cv, **kwargs
    )
    n = int(ref[1])
    assert int(dp[1]) == n
    assert np.array_equal(np.asarray(dp[0])[:, :n], np.asarray(ref[0])[:, :n])

    # int8 composed with sp-in-decode: the in-program cross-K/V quantization
    # computes per-frame scales, which shard over sp along with the frames
    from whisper_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) >= 8:
        sp = DataParallelEngine(
            tpu_model, make_mesh(dp=2, sp=2, tp=2), weights="int8"
        ).run(initial, ck, cv, **kwargs)
        assert int(sp[1]) == n
        assert np.array_equal(np.asarray(sp[0])[:, :n], np.asarray(ref[0])[:, :n])


def test_dp_speculative_matches_single_device(tpu_model, mesh8):
    """Sharded speculative greedy decode == single-device speculative decode
    token-for-token on the virtual (dp=4, tp=2) mesh — both models' weights
    sharded, draft proposals and verify passes running under GSPMD."""
    from whisper_tpu.models.dims import ModelDimensions
    from whisper_tpu.models import Whisper
    from whisper_tpu.parallel.serve import DataParallelSpeculativeEngine
    from whisper_tpu.speculative import SpeculativeEngine

    d = tpu_model.dims
    draft_dims = ModelDimensions(
        n_mels=d.n_mels, n_audio_ctx=d.n_audio_ctx, n_audio_state=64,
        n_audio_head=2, n_audio_layer=1, n_vocab=d.n_vocab, n_text_ctx=448,
        n_text_state=64, n_text_head=2, n_text_layer=1,
    )  # fmt: skip
    draft = Whisper(draft_dims, params=None, name="dp-draft", compute_dtype="float32")

    A = 4
    rng = np.random.RandomState(5)
    mel = (rng.randn(A, d.n_mels, 3000) * 0.5).astype(np.float32)
    ck, cv = tpu_model.cross_kv(tpu_model.encode(mel))
    dck, dcv = draft.cross_kv(draft.encode(mel))

    kwargs = dict(
        sot_index=0, suppress_ids=[11, 220], blank_ids=[220, 50257],
        max_initial_ts_index=50, sample_len=12, use_timestamps=True,
        temperature=0.0, eot=50257, timestamp_begin=50365,
        no_timestamps=50364, no_speech=50363,
    )  # fmt: skip
    initial = np.tile(np.array([[50258, 50259, 50359]], np.int32), (A, 1))

    ref = SpeculativeEngine(tpu_model, draft, k=3).run(
        initial, ck, cv, dck, dcv, **kwargs
    )
    dp = DataParallelSpeculativeEngine(tpu_model, draft, mesh8, k=3).run(
        initial, ck, cv, dck, dcv, **kwargs
    )

    n = int(ref[1])
    assert int(dp[1]) == n
    assert np.array_equal(np.asarray(dp[0])[:, :n], np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(dp[2]), np.asarray(ref[2]), atol=1e-4)

    # and with an sp axis: BOTH models' cross-K/V frame axes shard over sp
    # (the draft's too — same 1500-frame audio context by construction)
    from whisper_tpu.parallel.mesh import make_mesh

    sp_eng = DataParallelSpeculativeEngine(
        tpu_model, draft, make_mesh(dp=2, sp=2, tp=2), k=3
    )
    sp = sp_eng.run(initial, ck, cv, dck, dcv, **kwargs)
    assert int(sp[1]) == n
    assert np.array_equal(np.asarray(sp[0])[:, :n], np.asarray(ref[0])[:, :n])


def test_set_mesh_product_surface(tpu_model, mesh8, jfk_audio):
    """model.set_mesh(mesh) routes the PRODUCT decode surface through the
    sharded engine: ContinuousBatcher transcripts are identical with and
    without the mesh (slots=4 == dp degree, so rounds compile sharded)."""
    from whisper_tpu.continuous import ContinuousBatcher

    def run():
        cb = ContinuousBatcher(tpu_model, slots=4, language="en", temperature=0.0)
        t1 = cb.submit(jfk_audio)
        t2 = cb.submit(jfk_audio[16000 * 2 :])
        cb.drain()
        return [cb.result(t) for t in (t1, t2)]

    plain = run()
    tpu_model.set_mesh(mesh8)
    try:
        from whisper_tpu.parallel.serve import DataParallelEngine

        sharded = run()
        assert isinstance(tpu_model._fused_engine, DataParallelEngine)
    finally:
        tpu_model.set_mesh(None)
    for a, b in zip(sharded, plain):
        assert a["text"] == b["text"]
        assert [s["tokens"] for s in a["segments"]] == [
            s["tokens"] for s in b["segments"]
        ]


def test_dp_sp_engine_matches_single_device(tpu_model):
    """Sequence parallelism on the DECODE surface: a (dp=2, sp=2, tp=2) mesh
    shards the cross-K/V 1500-frame axis over sp inside the fused beam-search
    program (GSPMD inserts the cross-attention softmax collectives) and must
    stay token-identical to the single-device engine."""
    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.parallel.mesh import make_mesh
    from whisper_tpu.parallel.serve import DataParallelEngine, _frame_axis

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(dp=2, sp=2, tp=2)
    assert _frame_axis(mesh, tpu_model) == "sp"

    A = 4
    rng = np.random.RandomState(13)
    mel = (rng.randn(A, tpu_model.dims.n_mels, 3000) * 0.5).astype(np.float32)
    ck, cv = tpu_model.cross_kv(tpu_model.encode(mel))
    kwargs = dict(
        sot_index=0, suppress_ids=[11, 220], blank_ids=[220, 50257],
        max_initial_ts_index=50, sample_len=12, n_group=2, beam_search=True,
        max_candidates=2, use_timestamps=True, temperature=0.0,
        eot=50257, timestamp_begin=50365, no_timestamps=50364,
        no_speech=50363, rng_seed=0,
    )  # fmt: skip
    initial = np.tile(np.array([[50258, 50259, 50359]], np.int32), (A, 1))
    ref = FusedEngine(tpu_model).run(initial, ck, cv, **kwargs)
    sp = DataParallelEngine(tpu_model, mesh).run(initial, ck, cv, **kwargs)
    n = int(ref[1])
    assert int(sp[1]) == n
    assert np.array_equal(np.asarray(sp[0])[:, :n], np.asarray(ref[0])[:, :n])
    np.testing.assert_allclose(np.asarray(sp[2]), np.asarray(ref[2]), atol=1e-4)


def test_set_mesh_tolerates_extra_axes(tpu_model):
    """A mesh carrying sp/pp axes must still drive the product surface:
    sp now shards the cross-K/V frame axis inside the decode program
    (pp still replicates on the decode surface — the decoder fits one
    chip). decode() output must match the single-device engine."""
    from whisper_tpu.decoding import DecodingOptions, decode
    from whisper_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    rng = np.random.RandomState(9)
    mel_batch4 = (rng.randn(4, 80, 3000) * 0.6).astype(np.float32)
    kw = dict(language="en", temperature=0.0, sample_len=12)
    plain = decode(tpu_model, mel_batch4, DecodingOptions(**kw))
    tpu_model.set_mesh(make_mesh(dp=2, sp=2, tp=2))
    try:
        sharded = decode(tpu_model, mel_batch4, DecodingOptions(**kw))
    finally:
        tpu_model.set_mesh(None)
    for a, b in zip(sharded, plain):
        assert a.tokens == b.tokens
        assert a.text == b.text
