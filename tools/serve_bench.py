#!/usr/bin/env python
"""Sharded-serving benchmark: DataParallelEngine over a (dp, tp) mesh.

The reference is strictly single-device, so scale-out has no baseline there;
this is the measurement hook for whisper_tpu's mesh serving path
(parallel/serve.py). It reports aggregate real-time factor for N streams
decoded as one sharded fused batch, plus the single-device FusedEngine
number on the same workload for the collective-overhead comparison.

On a machine with one (or zero) accelerators it runs on a VIRTUAL CPU mesh
(--virtual N), which validates compilation/sharding and gives a relative
collective-overhead signal only — absolute numbers need a real multi-chip
slice, where this same command runs unchanged:

  python tools/serve_bench.py --model tiny --virtual 8 --dp 4 --tp 2
  python tools/serve_bench.py --model turbo --dp 4 --tp 2   # real slice
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--dp", type=int, default=None)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force an N-device virtual CPU platform")
    ap.add_argument("--streams", type=int, default=None,
                    help="audio streams per batch (default: 2*dp)")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--skip-single", action="store_true")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from whisper_tpu.engine_fused import FusedEngine
    from whisper_tpu.models import MODEL_DIMS, Whisper
    from whisper_tpu.parallel.mesh import make_mesh
    from whisper_tpu.parallel.serve import DataParallelEngine, dp_cross_kv, dp_encode
    from whisper_tpu.tokenizer import get_tokenizer

    n_dev = len(jax.devices())
    tp = args.tp
    dp = args.dp if args.dp is not None else n_dev // tp
    mesh = make_mesh(dp=dp, tp=tp)
    A = args.streams or 2 * dp

    dims = MODEL_DIMS[args.model]
    assert dims.n_text_head % tp == 0, f"{dims.n_text_head} heads not divisible by tp={tp}"
    model = Whisper(dims, params=None, name=args.model, compute_dtype="bfloat16")
    tok = get_tokenizer(True, language="en", task="transcribe")

    rng = np.random.RandomState(0)
    mel = (rng.randn(A, dims.n_mels, 3000) * 0.5).astype(np.float32)
    xa = dp_encode(model, mesh)(model.params["encoder"], mel)
    ck, cv = dp_cross_kv(model, mesh)(model.params["decoder"], xa)

    init = np.tile(np.array([list(tok.sot_sequence)], np.int32), (A, 1))
    kw = dict(
        sot_index=0, suppress_ids=[tok.eot], blank_ids=tok.encode(" ") + [tok.eot],
        max_initial_ts_index=50, sample_len=args.steps, n_group=args.beam,
        beam_search=True, max_candidates=args.beam, use_timestamps=True,
        temperature=0.0, eot=tok.eot, timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps, no_speech=tok.no_speech,
    )  # fmt: skip

    def timed(engine, c, v):
        engine.run(init, c, v, **kw)  # warm/compile
        ts = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            engine.run(init, c, v, **kw)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_sharded = timed(DataParallelEngine(model, mesh), ck, cv)
    result = {
        "metric": f"serve_{args.model}_dp{dp}_tp{tp}_{A}streams_bs{args.beam}",
        "platform": jax.devices()[0].platform,
        "streams": A,
        "steps": args.steps,
        "sharded_decode_s": round(t_sharded, 3),
        "sharded_ms_per_step": round(1e3 * t_sharded / args.steps, 3),
        "aggregate_x_realtime": round(A * 30.0 / t_sharded, 1),
    }
    if not args.skip_single:
        xa1 = model.encode(mel)
        ck1, cv1 = model.cross_kv(xa1)
        t_single = timed(FusedEngine(model), ck1, cv1)
        result["single_device_decode_s"] = round(t_single, 3)
        result["sharding_overhead_x"] = round(t_sharded / t_single, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
