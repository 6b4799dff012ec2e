#!/usr/bin/env python
"""Per-graph latency harness: times encoder / cross-KV / prefill / decode-step
/ fused-decode individually with synthetic inputs, per model size.

The TPU analog of the reference's native smoke/bench harness
(/root/reference/coreml/coremlTest.cpp:26-103), which loads all four compiled
CoreML graphs for a size and runs timed predictions on ones-tensors. Reports
first-call (compile-inclusive) and steady-state latency per graph.

Usage: python tools/graph_bench.py [--model turbo] [--beam 5] [--trials 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force completion with a tiny host transfer: under the remote-PJRT
    axon plugin `block_until_ready` returns before execution finishes, so
    timings without a transfer are dispatch-only (TODO.md measurement
    caveats) — the old form reported a 43 ms encoder as 0.19 ms."""
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])


def time_fn(fn, trials):
    t0 = time.perf_counter()
    _sync(fn())
    first = time.perf_counter() - t0
    # amortize the ~15-90 ms tunnel round trip over a chained batch of
    # executions per timing sample
    chain = 10
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn()
        _sync(out)
        times.append((time.perf_counter() - t0) / chain)
    return first, float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="turbo")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--steps", type=int, default=96, help="fused decode steps")
    ap.add_argument("--greedy", action="store_true", help="fused greedy instead of beam")
    ap.add_argument("--no-timestamps", action="store_true", help="disable timestamp rules")
    args = ap.parse_args()

    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.models import MODEL_DIMS, Whisper
    from whisper_tpu.tokenizer import get_tokenizer

    dims = MODEL_DIMS[args.model]
    model = Whisper(dims, params=None, name=args.model, compute_dtype="bfloat16")
    tok = get_tokenizer(True, language="en", task="transcribe")
    engine = FusedEngine(model)

    results = {}
    mel = jnp.zeros((1, dims.n_mels, 3000), jnp.float32)
    results["encoder"] = time_fn(lambda: model.encode(mel), args.trials)

    xa = model.encode(mel)
    results["cross_kv"] = time_fn(lambda: model.cross_kv(xa), args.trials)

    ck, cv = model.cross_kv(xa)
    tokens = np.array([[tok.sot, tok.sot + 1, tok.transcribe]], dtype=np.int32)
    results["prefill"] = time_fn(lambda: model.prefill(tokens, 3, ck, cv), args.trials)

    _, kv = model.prefill(tokens, 3, ck, cv)

    def one_step():
        cache = model.kv_to_cache(kv, beam=args.beam)
        return model.decode_step(
            np.zeros(args.beam, np.int32), 3, cache, np.arange(args.beam), ck, cv
        )[0]

    results["decode_step"] = time_fn(one_step, args.trials)

    beam_search = not args.greedy
    n_group = args.beam if beam_search else 1

    def fused():
        return engine.run(
            [tok.sot, tok.sot + 1, tok.transcribe],
            ck,
            cv,
            sot_index=0,
            suppress_ids=[tok.eot],
            blank_ids=[tok.eot],
            max_initial_ts_index=50,
            sample_len=args.steps,
            n_group=n_group,
            beam_search=beam_search,
            max_candidates=n_group,
            use_timestamps=not args.no_timestamps,
            temperature=0.0,
            eot=tok.eot,
            timestamp_begin=tok.timestamp_begin,
            no_timestamps=tok.no_timestamps,
            no_speech=tok.no_speech,
        )[0]

    results[f"fused_decode[{args.steps} steps]"] = time_fn(fused, max(2, args.trials // 2))

    # raw while_loop of bare decode_step (no filters / sampling / beam):
    # isolates the loop-mechanics + step cost from the decoding logic
    import jax.numpy as jnp2
    from whisper_tpu.models import graphs as G

    dec = model.params["decoder"]
    ckb, cvb = ck, cv  # decode_step groups beams onto per-audio K/V

    import functools as _ft

    @jax.jit
    def raw_loop(dec_params, ckx, cvx, cache):
        # params/caches passed as arguments (a closure would bake the weights
        # into the HLO as constants and explode compile time)
        def body(state):
            i, toks, cache = state
            logits, cache = G.decode_step(
                dec_params, toks, i + 3, cache,
                jnp2.arange(n_group, dtype=jnp2.int32),
                ckx, cvx, n_head=dims.n_text_head,
            )
            return (i + 1, jnp2.argmax(logits, -1).astype(jnp2.int32), cache)

        state = (jnp2.int32(0), jnp2.zeros(n_group, jnp2.int32), cache)
        state = jax.lax.while_loop(lambda s: s[0] < args.steps, body, state)
        return state[1]

    def raw():
        cache = model.kv_to_cache(kv, beam=n_group)
        return raw_loop(dec, ckb, cvb, cache)

    results[f"raw_step_loop[{args.steps} steps]"] = time_fn(raw, max(2, args.trials // 2))

    print(f"\nmodel={args.model} beam={args.beam} device={jax.devices()[0]}")
    print(f"{'graph':<26} {'first(s)':>10} {'steady(ms)':>12}")
    for name, (first, steady) in results.items():
        print(f"{name:<26} {first:>10.2f} {steady * 1000:>12.2f}")
    fused_key = f"fused_decode[{args.steps} steps]"
    per_tok = results[fused_key][1] / args.steps * 1000
    print(f"{'per-token (fused)':<26} {'':>10} {per_tok:>12.3f}")
    print(json.dumps({k: {"first_s": round(f, 3), "steady_ms": round(s * 1e3, 3)} for k, (f, s) in results.items()}))


if __name__ == "__main__":
    main()
