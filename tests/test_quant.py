"""Weight-only int8 decode (whisper_tpu/quant.py + graphs._dot).

int8 is an opt-in serving mode: token parity with bf16 is NOT a contract
(argmax ties may flip), so these tests pin (a) the quantizer's error bound,
(b) logits closeness at the graph level, (c) that the engine runs the whole
fused loop with quantized weights and stays deterministic, and (d) that the
bf16 default is bit-untouched by the new plumbing (covered transitively by
the parity suites, asserted directly here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.models import graphs
from whisper_tpu.quant import quantize_decoder


@pytest.fixture(scope="module")
def mel():
    return (np.random.RandomState(7).randn(80, 3000) * 0.6).astype(np.float32)


def test_quantize_error_bound(tpu_model):
    dec = tpu_model.params["decoder"]
    qdec = quantize_decoder(dec)
    w = np.asarray(dec["blocks"]["mlp_fc1_w"], np.float32)  # (L, K, N)
    wi8 = np.asarray(qdec["blocks"]["mlp_fc1_w"])
    s = np.asarray(qdec["blocks"]["mlp_fc1_w@scale"])  # (L, N)
    assert wi8.dtype == np.int8
    err = np.abs(w - wi8 * s[:, None, :])
    # symmetric rounding: error <= scale/2 per element
    assert np.all(err <= s[:, None, :] * 0.5 + 1e-8)
    # embedding: per-row scales
    emb = np.asarray(dec["tok_emb"], np.float32)
    ei8 = np.asarray(qdec["tok_emb"])
    es = np.asarray(qdec["tok_emb@scale"])
    assert np.all(np.abs(emb - ei8 * es[:, None]) <= es[:, None] * 0.5 + 1e-8)


def test_logits_close(tpu_model):
    dec = tpu_model.params["decoder"]
    qdec = quantize_decoder(dec)
    hidden = jnp.asarray(
        (np.random.RandomState(3).randn(4, tpu_model.dims.n_text_state) * 0.5).astype(
            np.float32
        )
    )
    ref = np.asarray(graphs.hidden_to_logits(dec, hidden))
    q = np.asarray(graphs.hidden_to_logits(qdec, hidden))
    scale = np.abs(ref).max() + 1e-6
    assert np.max(np.abs(ref - q)) / scale < 0.02


def test_decode_step_logits_close(tpu_model, mel):
    dims = tpu_model.dims
    dec = tpu_model.params["decoder"]
    qdec = quantize_decoder(dec)
    xa = tpu_model.encode(mel[None])
    ck, cv = tpu_model.cross_kv(xa)
    B = 2
    cache = graphs.make_empty_cache(
        dims.n_text_layer, B, dims.n_text_state, jnp.float32
    )
    tokens = jnp.asarray([50258, 50259], jnp.int32)
    ckb = jnp.broadcast_to(ck, ck.shape[:1] + (1,) + ck.shape[2:])
    args = dict(pos=jnp.int32(0), src=jnp.arange(B, dtype=jnp.int32))
    ref, _ = graphs.decode_step(
        dec, tokens, args["pos"], cache, args["src"], ckb, cv,
        n_head=dims.n_text_head,
    )  # fmt: skip
    q, _ = graphs.decode_step(
        qdec, tokens, args["pos"], cache, args["src"], ckb, cv,
        n_head=dims.n_text_head,
    )  # fmt: skip
    ref, q = np.asarray(ref), np.asarray(q)
    scale = np.abs(ref).max() + 1e-6
    assert np.max(np.abs(ref - q)) / scale < 0.05
    # the most-probable token survives quantization on this easy case
    assert np.array_equal(np.argmax(ref, -1), np.argmax(q, -1))


def test_cross_kv_quantization(tpu_model, mel):
    """Per-column int8 cross-K/V: the K scale factors out of the score dot
    and the V scale folds into the softmax weights — outputs must track the
    bf16 path closely, and the quantizer's per-column error bound holds."""
    from whisper_tpu.quant import quantize_cross_kv

    xa = tpu_model.encode(mel[None])
    ck, cv = tpu_model.cross_kv(xa)
    (ck_i8, ck_s), (cv_i8, cv_s) = quantize_cross_kv(ck, cv)
    ckf = np.asarray(ck, np.float32)
    err = np.abs(ckf - np.asarray(ck_i8) * np.asarray(ck_s)[:, :, :, None, :])
    assert np.all(err <= np.asarray(ck_s)[:, :, :, None, :] * 0.5 + 1e-8)

    dec = tpu_model.params["decoder"]
    blk = jax.tree.map(lambda a: a[0], dec["blocks"])
    x = jnp.asarray(
        (np.random.RandomState(5).randn(1, 4, tpu_model.dims.n_text_state) * 0.3
         ).astype(np.float32)
    )  # fmt: skip
    ref, _ = graphs._cross_attention(x, blk, ck[0], cv[0], tpu_model.dims.n_text_head)
    q, _ = graphs._cross_attention(
        x, blk, (ck_i8[0], ck_s[0]), (cv_i8[0], cv_s[0]), tpu_model.dims.n_text_head
    )
    ref, q = np.asarray(ref), np.asarray(q)
    scale = np.abs(ref).max() + 1e-6
    assert np.max(np.abs(ref - q)) / scale < 0.05


def _engine_kwargs(tok, sample_len=12, beam=2):
    return dict(
        sot_index=0, suppress_ids=[tok.eot], blank_ids=tok.encode(" ") + [tok.eot],
        max_initial_ts_index=50, sample_len=sample_len, n_group=beam,
        beam_search=beam > 1, max_candidates=beam, use_timestamps=True,
        temperature=0.0, eot=tok.eot, timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps, no_speech=tok.no_speech,
    )  # fmt: skip


def test_engine_int8_runs_and_is_deterministic(tpu_model, mel):
    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(tpu_model.is_multilingual, language="en", task="transcribe")
    xa = tpu_model.encode(mel[None])
    ck, cv = tpu_model.cross_kv(xa)
    initial = np.array([list(tok.sot_sequence)], np.int32)
    kw = _engine_kwargs(tok)

    eng = FusedEngine(tpu_model, weights="int8")
    out1 = eng.run(initial, ck, cv, **kw)
    out2 = eng.run(initial, ck, cv, **kw)
    n = int(out1[1])
    assert n > len(tok.sot_sequence)
    toks = np.asarray(out1[0])[:, :n]
    assert np.all(toks >= 0) and np.all(toks < tpu_model.dims.n_vocab)
    assert int(out2[1]) == n
    assert np.array_equal(np.asarray(out2[0])[:, :n], toks)


def test_engine_int8_close_to_bf16_tokens(tpu_model, mel):
    """Not a parity contract — but on a short easy decode the two engines
    should agree (catches gross wiring bugs like double-scaling)."""
    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(tpu_model.is_multilingual, language="en", task="transcribe")
    xa = tpu_model.encode(mel[None])
    ck, cv = tpu_model.cross_kv(xa)
    initial = np.array([list(tok.sot_sequence)], np.int32)
    kw = _engine_kwargs(tok, sample_len=8, beam=1)

    ref = FusedEngine(tpu_model).run(initial, ck, cv, **kw)
    q = FusedEngine(tpu_model, weights="int8").run(initial, ck, cv, **kw)
    n_ref, n_q = int(ref[1]), int(q[1])
    a = np.asarray(ref[0])[0, :n_ref]
    b = np.asarray(q[0])[0, :n_q]
    m = min(len(a), len(b))
    agree = np.mean(a[:m] == b[:m])
    assert agree >= 0.75, (a.tolist(), b.tolist())


def test_engine_int8_bf16_model(tiny_dims):
    """Production engines run bf16 compute; the dtype probe must not pick an
    f32 LN/scale leaf (cast_params keeps LNs f32 — a bug the f32 test model
    can't see: the quantized first run produced an f32 cache carry and the
    while_loop rejected the dtype mismatch)."""
    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.models import Whisper
    from whisper_tpu.tokenizer import get_tokenizer

    model = Whisper(tiny_dims, params=None, name="q", compute_dtype="bfloat16")
    tok = get_tokenizer(True, language="en", task="transcribe")
    initial = np.array([list(tok.sot_sequence)], np.int32)
    L, H = tiny_dims.n_text_layer, tiny_dims.n_text_head
    dh = tiny_dims.n_text_state // H
    ck = jnp.zeros((L, 1, H, dh, tiny_dims.n_audio_ctx), jnp.bfloat16)
    out = FusedEngine(model, weights="int8").run(
        initial, ck, ck, **_engine_kwargs(tok, sample_len=8, beam=2)
    )
    assert int(out[1]) > len(tok.sot_sequence)


def test_env_var_opt_in(tpu_model, monkeypatch):
    from whisper_tpu.engine_fused import FusedEngine

    monkeypatch.setenv("WHISPER_TPU_WEIGHTS", "int8")
    eng = FusedEngine(tpu_model)
    dec = eng._decoder_params()
    assert dec["blocks"]["attn_q_w"].dtype == jnp.int8
    assert "attn_q_w@scale" in dec["blocks"]
    # model's own tree untouched (fidelity paths keep bf16/f32)
    assert tpu_model.params["decoder"]["blocks"]["attn_q_w"].dtype != jnp.int8
    monkeypatch.setenv("WHISPER_TPU_WEIGHTS", "nope")
    with pytest.raises(ValueError):
        FusedEngine(tpu_model)._decoder_params()


def test_bf16_default_unchanged(tpu_model):
    """The default engine's param tree is the model's own decoder tree (no
    copies, no quantization) — the parity suites' guarantees carry over."""
    from whisper_tpu.engine_fused import FusedEngine

    eng = FusedEngine(tpu_model)
    assert eng._decoder_params() is tpu_model.params["decoder"]
