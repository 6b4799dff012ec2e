#!/usr/bin/env python
"""Speculative-decoding bench: turbo verified, tiny-class draft proposing.

Real acceptance rates need real weights (literature: ~0.7-0.9 for tiny->turbo
greedy on clean speech; higher for distil drafts), which this environment
cannot download. What CAN be measured honestly on random weights is the
acceptance BRACKET:

  * upper bound (accept == 1): suppress every token but one text token — both
    models' filtered argmax is then that token at every position, so every
    draft is accepted deterministically and the loop takes K+1-token strides.
  * lower bound (accept ~= 0): an independently-initialized draft almost
    never matches the target's argmax on random weights — every round
    verifies one token plus the bonus.

Real-weight throughput lands between the brackets at
  tokens/round = 1 + accept_rate * K  (plus the all-accept bonus term).

Usage: python tools/spec_bench.py [K ...]   (default: 4 8)
Output: one JSON line per configuration.
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("WHISPER_TPU_CACHE_DIR", os.path.join(REPO, ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from whisper_tpu.engine_fused import FusedEngine  # noqa: E402
from whisper_tpu.frontend import clip_frontend_spec  # noqa: E402
from whisper_tpu.models import MODEL_DIMS, Whisper  # noqa: E402
from whisper_tpu.speculative import SpeculativeEngine  # noqa: E402
from whisper_tpu.tokenizer import get_tokenizer  # noqa: E402

CLIP_SECONDS = 60
SAMPLE_LEN = 96
N_TRIALS = 5


def main():
    ks = [int(a) for a in sys.argv[1:]] or [4, 8]
    target_name = os.environ.get("SPEC_TARGET", "turbo")
    draft_name = os.environ.get("SPEC_DRAFT", "tiny")
    dims_t = MODEL_DIMS[target_name]
    # the practical draft must share the target's tokenizer; a real
    # deployment uses a v3-vocab tiny/distil checkpoint — synthetically we
    # take the draft architecture and pin its vocab to the target's
    dims_d = dataclasses.replace(MODEL_DIMS[draft_name], n_vocab=dims_t.n_vocab)

    model = Whisper(dims_t, params=None, name=target_name, compute_dtype="bfloat16")
    draft = Whisper(dims_d, params=None, name=draft_name, compute_dtype="bfloat16")
    tok = get_tokenizer(True, language="en", task="transcribe")

    n_windows = CLIP_SECONDS // 30
    rng = np.random.RandomState(0)
    audio = (rng.randn((n_windows + 1) * 480000) * 3000).astype(np.int16)
    audio_d = jnp.asarray(audio)

    frontend = clip_frontend_spec(dims_t, dims_d, n_windows)
    t0 = time.perf_counter()
    ck, cv, dck, dcv = frontend(
        model.params["encoder"], model.params["decoder"],
        draft.params["encoder"], draft.params["decoder"], audio_d,
    )
    jax.device_get(ck[0, 0, 0, 0, :1])
    t_frontend = time.perf_counter() - t0

    initial = np.tile(
        np.array([list(tok.sot_sequence)], np.int32), (n_windows, 1)
    )
    one_tok = tok.encode(" and")[0]
    V = dims_t.n_vocab
    base = dict(
        sot_index=0,
        blank_ids=tok.encode(" ") + [tok.eot],
        max_initial_ts_index=50,
        sample_len=SAMPLE_LEN,
        use_timestamps=False,
        temperature=0.0,
        eot=tok.eot,
        timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech,
    )
    accept_all = dict(base, suppress_ids=[i for i in range(V) if i != one_tok])
    accept_none = dict(base, suppress_ids=[tok.eot])

    def timed(run):
        run()  # warmup (server compile on first execute)
        times = []
        for _ in range(N_TRIALS):
            t0 = time.perf_counter()
            out = run()
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), int(out[1])

    results = []
    fe = FusedEngine(model)

    def fused_run(kw):
        return lambda: fe.run(
            initial, ck, cv, n_group=1, beam_search=False, max_candidates=0, **kw
        )

    fused_p50 = {}
    for label, kw in (("accept1", accept_all), ("accept0", accept_none)):
        p50, n = timed(fused_run(kw))
        fused_p50[label] = p50
        results.append(("fused_greedy", label, None, p50, n))

    for k in ks:
        se = SpeculativeEngine(model, draft, k=k)
        for label, kw in (("accept1", accept_all), ("accept0", accept_none)):
            p50, n = timed(lambda: se.run(initial, ck, cv, dck, dcv, **kw))
            # measured acceptance telemetry: the bracket construction makes
            # the expected values exact (accept1 -> 1.0, accept0 -> ~0), so
            # this doubles as an on-chip check of engine.last_stats
            acc = round(float(np.mean(se.last_stats["draft_acceptance"])), 3)
            results.append(("speculative", label, k, p50, n, acc))

    for eng, label, k, p50, n, *rest in results:
        tokens = (n - initial.shape[1]) * n_windows
        print(json.dumps({
            "engine": eng,
            "bracket": label,
            "K": k,
            "p50_decode_s": round(p50, 4),
            "tokens": tokens,
            "tokens_per_s": round(tokens / p50, 1),
            "vs_fused": round(fused_p50[label] / p50, 3) if eng == "speculative" else 1.0,
            "measured_acceptance": rest[0] if rest else None,
            "frontend_s": round(t_frontend, 3),
        }))


if __name__ == "__main__":
    main()
