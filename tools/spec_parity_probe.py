#!/usr/bin/env python
"""On-chip (TPU bf16) token-agreement probe: speculative vs fused greedy.

The CPU f32 parity tests pin spec == fused exactly, but on TPU bf16 the
verify chunk's (A, K+1, d) matmul accumulation differs from the step loop's
(A, 1, d) shapes, so NEAR-TIE argmaxes can in principle flip (the same
mechanism PARITY.md documents for int8 mode). This probe measures the actual
on-chip disagreement rate on the bench workload (random weights, EOT
suppressed, timestamps on, 96 tokens x 2 windows x N seeds).

Usage: python tools/spec_parity_probe.py [n_seeds]
"""

import dataclasses
import json
import os
import sys

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

SAMPLE_LEN = 96
N_WINDOWS = 2


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dims_t = MODEL_DIMS["turbo"]
    dims_d = dataclasses.replace(MODEL_DIMS["tiny"], n_vocab=dims_t.n_vocab)
    model = Whisper(dims_t, params=None, name="turbo", compute_dtype="bfloat16")
    draft = Whisper(dims_d, params=None, name="tiny", compute_dtype="bfloat16")
    tok = get_tokenizer(True, language="en", task="transcribe")

    frontend = clip_frontend_spec(dims_t, dims_d, N_WINDOWS)
    fe = FusedEngine(model)
    se = SpeculativeEngine(model, draft, k=4)

    initial = np.tile(np.array([list(tok.sot_sequence)], np.int32), (N_WINDOWS, 1))
    kw = dict(
        sot_index=0,
        suppress_ids=[tok.eot],
        blank_ids=tok.encode(" ") + [tok.eot],
        max_initial_ts_index=50,
        sample_len=SAMPLE_LEN,
        use_timestamps=True,
        temperature=0.0,
        eot=tok.eot,
        timestamp_begin=tok.timestamp_begin,
        no_timestamps=tok.no_timestamps,
        no_speech=tok.no_speech,
    )

    total = agree = 0
    first_div = []
    for seed in range(n_seeds):
        rng = np.random.RandomState(seed)
        audio = jnp.asarray(
            (rng.randn((N_WINDOWS + 1) * 480000) * 3000).astype(np.int16)
        )
        ck, cv, dck, dcv = frontend(
            model.params["encoder"], model.params["decoder"],
            draft.params["encoder"], draft.params["decoder"], audio,
        )
        f = fe.run(initial, ck, cv, n_group=1, beam_search=False, max_candidates=0, **kw)
        s = se.run(initial, ck, cv, dck, dcv, **kw)
        n = min(int(f[1]), int(s[1]))
        a = np.asarray(f[0])[:, :n]
        b = np.asarray(s[0])[:, :n]
        eq = a == b
        total += eq.size
        agree += int(eq.sum())
        for row in range(eq.shape[0]):
            div = np.argmin(eq[row]) if not eq[row].all() else -1
            if div >= 0:
                first_div.append(int(div))

    print(
        json.dumps(
            {
                "seeds": n_seeds,
                "positions_compared": total,
                "agree": agree,
                "agreement_rate": round(agree / total, 6),
                "rows_with_divergence": len(first_div),
                "earliest_divergence_pos": min(first_div) if first_div else None,
            }
        )
    )


if __name__ == "__main__":
    main()
