#!/usr/bin/env python
"""Per-graph latency harness: times encoder / cross-KV / prefill / decode-step
/ fused-decode individually with synthetic inputs, per model size.

The TPU analog of the reference's native smoke/bench harness
(/root/reference/coreml/coremlTest.cpp:26-103), which loads all four compiled
CoreML graphs for a size and runs timed predictions on ones-tensors. Reports
first-call (compile-inclusive) and steady-state latency per graph.

Each graph also gets a ROOFLINE row: XLA's own cost model (compiled
cost_analysis: flops + bytes accessed) against the chip's peak compute and
HBM bandwidth gives the speed-of-light time max(flops/peak, bytes/bw); the
table reports measured steady-state against that bound and which resource
binds. Caveats: "bytes accessed" is the compiler's estimate over all
operands/outputs (it counts some VMEM-resident intermediates, so the
bandwidth bound is conservative), and peaks default to TPU v5e
(197 bf16 TFLOP/s, 819 GB/s) — override with --peak-tflops/--peak-gbs.

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
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak bf16 TFLOP/s (default: TPU v5e)")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="chip peak HBM GB/s (default: TPU v5e)")
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

    results[f"raw_step_loop[{args.steps} steps]"] = time_fn(
        raw, max(2, args.trials // 2)
    )

    # word-timestamp alignment replay (prefill + alignment-head capture),
    # the reference Decoder256's out_cross_head_weights path
    align_tokens = np.array(
        [[tok.sot, tok.sot + 1, tok.transcribe] + tok.encode(" and so on")],
        dtype=np.int32,
    )
    n_align = align_tokens.shape[1]
    results["align_replay"] = time_fn(
        lambda: model.prefill_align(align_tokens, n_align, ck, cv), args.trials
    )

    # ---- rooflines: XLA cost model vs measured steady-state ---------------
    def cost(jitted, *a):
        c = jitted.lower(*a).compile().cost_analysis()
        c = c[0] if isinstance(c, list) else c
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))

    dec_p = model.params["decoder"]
    padded3 = jnp2.zeros((1, G.PREFILL_LEN), jnp2.int32)
    cache5 = model.kv_to_cache(kv, beam=args.beam)
    # the timing call above populated the cache under this exact key
    align_fn = model._prefill_align_cache[tuple(model.alignment_heads)]
    # encode/prefill iterate layers with lax.scan, whose body XLA's cost
    # analysis prices ONCE — lower unrolled cost-only variants so every
    # layer is counted (unroll changes accounting, not math)
    import functools as _ft2

    enc_unrolled = jax.jit(_ft2.partial(
        G.encode, n_head=dims.n_audio_head, unroll=dims.n_audio_layer))
    pre_unrolled = jax.jit(_ft2.partial(
        G.prefill, n_head=dims.n_text_head, unroll=dims.n_text_layer))
    graphs_cost = {
        "encoder": cost(enc_unrolled, model.params["encoder"], mel),
        "cross_kv": cost(model._cross_kv, dec_p, xa),
        "prefill": cost(pre_unrolled, dec_p, padded3, jnp2.int32(3), ck, cv),
        "decode_step": cost(
            model._decode_step, dec_p, jnp2.zeros(args.beam, jnp2.int32),
            jnp2.int32(3), cache5, jnp2.arange(args.beam, dtype=jnp2.int32),
            ck, cv,
        ),
        "align_replay": cost(
            align_fn, dec_p, padded3, jnp2.int32(n_align), ck, cv
        ),
    }

    print(f"\nmodel={args.model} beam={args.beam} device={jax.devices()[0]}")
    print(f"{'graph':<26} {'first(s)':>10} {'steady(ms)':>12}")
    for name, (first, steady) in results.items():
        print(f"{name:<26} {first:>10.2f} {steady * 1000:>12.2f}")
    fused_key = f"fused_decode[{args.steps} steps]"
    per_tok = results[fused_key][1] / args.steps * 1000
    print(f"{'per-token (fused)':<26} {'':>10} {per_tok:>12.3f}")

    # Analytic HBM floors: bytes the math REQUIRES to move — weights read
    # once, caches read+written, operands in, results out. A true lower
    # bound on traffic (XLA's "bytes accessed" over-counts fused
    # intermediates several-fold), so SoL% against max(mxu, floor) is an
    # honest "at least this far from speed-of-light".
    def tree_nbytes(t):
        return sum(l.nbytes for l in jax.tree.leaves(t))

    enc_w = tree_nbytes(model.params["encoder"])
    dec_w = tree_nbytes(dec_p)
    blocks_w = tree_nbytes(dec_p["blocks"])
    # cross_kv reads only the K/V projections (graphs.cross_kv)
    cross_w = tree_nbytes(
        {
            k: v
            for k, v in dec_p["blocks"].items()
            if k in ("cross_k_w", "cross_v_w", "cross_v_b")
        }
    )
    emb_rows_bytes = dec_p["tok_emb"].nbytes  # logits head reads full vocab
    ckv_b = ck.nbytes + cv.nbytes
    cache_b = tree_nbytes(cache5)
    kv_out_b = tree_nbytes(kv)
    V = dims.n_vocab
    floors = {
        "encoder": enc_w + mel.nbytes + xa.nbytes,
        "cross_kv": cross_w + xa.nbytes + ckv_b,
        # prefill embeds 256 rows (gather, not the full table) and has no
        # logits head; weights once + cross-K/V once + the kv block out
        "prefill": blocks_w + ckv_b + kv_out_b,
        "decode_step": dec_w + 2 * cache_b + ckv_b + args.beam * V * 4,
        "align_replay": blocks_w + ckv_b + kv_out_b + emb_rows_bytes,
    }
    floors["decode_tok(fused)"] = floors["decode_step"]

    print(
        f"\nroofline vs peaks {args.peak_tflops:.0f} bf16 TFLOP/s, "
        f"{args.peak_gbs:.0f} GB/s (flops/xlaMB: XLA cost model — bytes "
        f"over-count fused intermediates; floorMB: analytic traffic the "
        f"math requires; SoL% = max(mxu, floor-hbm) bound / measured)"
    )
    header = (
        f"{'graph':<18} {'steady(ms)':>10} {'GFLOP':>8} {'xlaMB':>8} "
        f"{'floorMB':>8} {'mxu(ms)':>8} {'hbm(ms)':>8} {'bound':>6} {'SoL%':>6}"
    )
    print(header)
    roofline_json = {}
    # the standalone decode_step row pays a per-dispatch tunnel round trip
    # the production path never sees; the fused loop's per-token time is the
    # honest "measured" for the step graph (its body = step + filters)
    graphs_cost["decode_tok(fused)"] = graphs_cost["decode_step"]
    measured = {name: results[name][1] for name in graphs_cost if name in results}
    measured["decode_tok(fused)"] = results[fused_key][1] / args.steps
    for name, (flops, bts) in graphs_cost.items():
        steady = measured[name]
        t_mxu = flops / (args.peak_tflops * 1e12)
        t_hbm = floors[name] / (args.peak_gbs * 1e9)
        t_sol = max(t_mxu, t_hbm)
        bound = "mxu" if t_mxu >= t_hbm else "hbm"
        sol_pct = 100.0 * t_sol / steady if steady > 0 else 0.0
        print(
            f"{name:<18} {steady * 1e3:>10.2f} {flops / 1e9:>8.1f} "
            f"{bts / 1e6:>8.1f} {floors[name] / 1e6:>8.1f} "
            f"{t_mxu * 1e3:>8.2f} {t_hbm * 1e3:>8.2f} "
            f"{bound:>6} {sol_pct:>6.1f}"
        )
        roofline_json[name] = {
            "steady_ms": round(steady * 1e3, 3),
            "gflop": round(flops / 1e9, 2),
            "xla_mb_accessed": round(bts / 1e6, 2),
            "floor_mb": round(floors[name] / 1e6, 2),
            "mxu_bound_ms": round(t_mxu * 1e3, 3),
            "hbm_bound_ms": round(t_hbm * 1e3, 3),
            "bound": bound,
            "pct_of_roofline": round(sol_pct, 1),
        }

    print(json.dumps({
        "timings": {
            k: {"first_s": round(f, 3), "steady_ms": round(s * 1e3, 3)}
            for k, (f, s) in results.items()
        },
        "roofline": roofline_json,
    }))


if __name__ == "__main__":
    main()
