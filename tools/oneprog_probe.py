#!/usr/bin/env python
"""Does fusing the whole clip (mel -> encoder -> cross-KV -> beam decode)
into ONE device program beat the production two-program path?

The two-program path already pipelines: JAX dispatches the frontend and the
fused-decode executions asynchronously and only the final device_get blocks,
so in theory one program saves just one dispatch. But on the tunnel backend
each execute RPC carries real overhead, so measure, don't guess.

Usage: python tools/oneprog_probe.py [trials]
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("XLA_FLAGS", "")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("WHISPER_TPU_CACHE_DIR", os.path.join(REPO, ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from whisper_tpu.engine_fused import FusedConfig, FusedEngine, fused_decode  # noqa: E402
from whisper_tpu.frontend import N_FRAMES, clip_frontend  # noqa: E402
from whisper_tpu.models import MODEL_DIMS, Whisper  # noqa: E402
from whisper_tpu.models import graphs  # noqa: E402
from whisper_tpu.ops.stft import log_mel_spectrogram_jax  # noqa: E402
from whisper_tpu.tokenizer import get_tokenizer  # noqa: E402

CLIP_SECONDS = 60
SAMPLE_LEN = 96
BEAM = 5
N_WINDOWS = CLIP_SECONDS // 30


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    model_name = os.environ.get("BENCH_MODEL", "turbo")
    dims = MODEL_DIMS[model_name]
    model = Whisper(dims, params=None, name=model_name, compute_dtype="bfloat16")
    engine = FusedEngine(model)
    tok = get_tokenizer(True, language="en", task="transcribe")

    initial_tokens = list(tok.sot_sequence)
    suppress_ids = [tok.eot]
    blank_ids = tok.encode(" ") + [tok.eot]
    rng = np.random.RandomState(0)
    audio_padded = jnp.asarray(
        (rng.randn((N_WINDOWS + 1) * 480000) * 3000).astype(np.int16)
    )
    initial_batch = np.tile(np.array([initial_tokens], dtype=np.int32), (N_WINDOWS, 1))
    run_kw = dict(
        sot_index=0,
        suppress_ids=suppress_ids,
        blank_ids=blank_ids,
        max_initial_ts_index=50,
        sample_len=SAMPLE_LEN,
        n_group=BEAM,
        beam_search=True,
        max_candidates=BEAM,
        use_timestamps=True,
        temperature=0.0,
        eot=tok.eot,
        timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech,
    )

    frontend = clip_frontend(dims.n_mels, dims.n_audio_head, dims.n_text_head, N_WINDOWS)

    def two_prog():
        ck, cv = frontend(model.params["encoder"], model.params["decoder"], audio_padded)
        return engine.run(initial_batch, ck, cv, **run_kw)

    # ---- one-program variant ----
    n_initial = len(initial_tokens)
    n_ctx = graphs.CACHE_SLOTS
    max_tokens = n_initial + SAMPLE_LEN
    last_window = next(w for w in (128, 256, n_ctx) if max_tokens <= w)
    cfg = FusedConfig(
        n_group=BEAM,
        n_audio=N_WINDOWS,
        beam_search=True,
        use_timestamps=True,
        max_candidates=BEAM,
        eot=tok.eot,
        timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech,
        last_window=last_window,
    )
    V = dims.n_vocab
    sup = np.zeros(V, bool)
    sup[suppress_ids] = True
    blk = np.zeros(V, bool)
    blk[blank_ids] = True
    sup, blk = jnp.asarray(sup), jnp.asarray(blk)
    toks = np.zeros((N_WINDOWS, n_ctx), np.int32)
    toks[:, :n_initial] = initial_batch
    toks = jnp.asarray(toks)
    scal = lambda v, dt="int32": jnp.asarray(v, dt)  # noqa: E731
    args = (
        toks,
        scal(n_initial),
        scal(0),
        sup,
        blk,
        scal(50),
        scal(SAMPLE_LEN),
        scal(0.0, "float32"),
        scal(0),
    )

    @partial(jax.jit, static_argnames=())
    def one_prog_fn(enc, dec, audio, toks, sb, sot_i, sup, blank, mi, sl, temp, seed):
        mel = log_mel_spectrogram_jax(audio, dims.n_mels)
        w = mel[:, : N_WINDOWS * N_FRAMES].reshape(dims.n_mels, N_WINDOWS, N_FRAMES)
        xa = graphs.encode(enc, jnp.transpose(w, (1, 0, 2)), n_head=dims.n_audio_head)
        ck, cv = graphs.cross_kv(dec, xa, n_head=dims.n_text_head)
        return fused_decode(
            dec, toks, sb, ck, cv, sot_i, sup, blank, mi, sl, temp, seed,
            n_head=dims.n_text_head, cfg=cfg, cache_dtype=jnp.bfloat16,
        )

    def one_prog():
        out = one_prog_fn(
            model.params["encoder"], model.params["decoder"], audio_padded, *args
        )
        return jax.device_get(out)

    # warm both (server compiles)
    for name, fn in (("two", two_prog), ("one", one_prog)):
        t0 = time.perf_counter()
        fn()
        print(f"{name}-program warm in {time.perf_counter()-t0:.1f}s", flush=True)

    results = {"two": [], "one": []}
    for i in range(trials):
        for name, fn in (("two", two_prog), ("one", one_prog)):
            t0 = time.perf_counter()
            out = fn()
            results[name].append(time.perf_counter() - t0)
    import json

    two_p50 = float(np.median(results["two"]))
    one_p50 = float(np.median(results["one"]))
    print(
        json.dumps(
            {
                "two_prog_p50_s": round(two_p50, 4),
                "one_prog_p50_s": round(one_p50, 4),
                "speedup": round(two_p50 / one_p50, 3),
                "two_all": [round(t, 3) for t in results["two"]],
                "one_all": [round(t, 3) for t in results["one"]],
            }
        ),
        flush=True,
    )
    # sanity: same tokens
    o1 = one_prog()
    o2 = two_prog()
    assert np.array_equal(np.asarray(o1[0]), np.asarray(o2[0])), "token mismatch!"
    print("token parity OK", flush=True)


if __name__ == "__main__":
    main()
