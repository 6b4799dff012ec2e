"""Fused beam-update Pallas kernel vs the jnp reference path, bit-level.

The jnp path (engine_fused._apply_filters + _beam_update) is pinned against
the host engine which is pinned against the reference implementation, so
kernel == jnp here means kernel == reference.

Equivalence matrix for the default-OFF kernels (ops/beam_kernel.py) — every
semantics-bearing path must stay covered or the kernels move to experiments/:

  path                        | covered by
  ----------------------------+------------------------------------------
  beam update, timestamps ON  | test_kernel_matches_jnp_update[use_ts=True]
  beam update, timestamps OFF | test_kernel_matches_jnp_update[use_ts=False]
  beam finished-pool fold     | test_kernel_matches_jnp_update[boost_eot]
  beam step-0 dedup           | test_kernel_matches_jnp_update[step=0]
  greedy t==0, ts ON/OFF      | test_greedy_kernel_matches_jnp
  single- vs two-pass sweep   | test_kernel_matches_jnp_update[single_pass]
  engine plumbing: greedy     | test_fused.py::test_fused_pallas_wiring[greedy]
  engine plumbing: beam       | test_fused.py::test_fused_pallas_wiring[beam2]
  t>0 lax.cond fallback       | test_fused.py::test_fused_pallas_wiring[sampling-fallback]
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.engine_fused import (
    FusedConfig,
    FusedState,
    _apply_filters,
    _beam_update,
)
from whisper_tpu.ops.beam_kernel import (
    BeamKernelConfig,
    beam_update_pallas,
    build_penalty_vectors,
)

V = 51866
TS_BEGIN = 50365  # multilingual large-v3 vocab layout
EOT = 50257
NO_TS = 50364
G = 5
T = 448
MAX_CAND = 5


def make_state(rng, n_tokens, step, fcount=0):
    tokens = rng.randint(100, 5000, size=(G, T)).astype(np.int32)
    if step > 0:
        # make beams distinct and give some rows a timestamp history
        tokens[1, 4] = TS_BEGIN + 10
        tokens[1, 5] = TS_BEGIN + 10
        tokens[2, n_tokens - 1] = TS_BEGIN + 30
        tokens[3, n_tokens - 2] = TS_BEGIN + 7
        tokens[3, n_tokens - 1] = TS_BEGIN + 12
    else:
        tokens = np.tile(tokens[:1], (G, 1))
    state = FusedState(
        step=jnp.int32(step),
        n_tokens=jnp.int32(n_tokens),
        tokens=jnp.asarray(tokens),
        cache=jnp.zeros(()),  # unused by the update
        src=jnp.arange(G, dtype=jnp.int32),
        sum_logprobs=jnp.asarray(rng.randn(G).astype(np.float32) * (step > 0)),
        completed=jnp.bool_(False),
        finished_tokens=jnp.zeros((1, MAX_CAND, T + 1), jnp.int32),
        finished_scores=jnp.full((1, MAX_CAND), -jnp.inf, jnp.float32),
        finished_lengths=jnp.zeros((1, MAX_CAND), jnp.int32),
        finished_count=jnp.full((1,), fcount, jnp.int32),
        rng=jax.random.PRNGKey(0),
    )
    return state


@pytest.mark.parametrize("single_pass", [True, False])
@pytest.mark.parametrize(
    "n_tokens, step, boost_eot, use_ts",
    [
        (3, 0, False, True),
        (8, 3, False, True),
        (8, 3, True, True),  # EOT among top candidates -> finished pool path
        (10, 5, True, False),
        (3, 0, False, False),
    ],
)
def test_kernel_matches_jnp_update(n_tokens, step, boost_eot, use_ts, single_pass):
    rng = np.random.RandomState(step * 7 + n_tokens)
    state = make_state(rng, n_tokens, step)

    logits = rng.randn(G, V).astype(np.float32)
    if boost_eot:
        logits[:, EOT] += 6.0  # force EOT into the candidate set

    suppress_ids = [1, 2, 3, 11, 220]
    blank_ids = [220, EOT]
    max_initial = 50
    sample_begin = 3

    cfg = FusedConfig(
        n_group=G,
        n_audio=1,
        beam_search=True,
        use_timestamps=use_ts,
        max_candidates=MAX_CAND,
        eot=EOT,
        timestamp_begin=TS_BEGIN,
        no_timestamps=NO_TS,
        no_speech=50363,
    )

    suppress_mask = np.zeros(V, bool)
    suppress_mask[suppress_ids] = True
    blank_mask = np.zeros(V, bool)
    blank_mask[blank_ids] = True

    filtered = _apply_filters(
        jnp.asarray(logits),
        state.tokens,
        state.n_tokens,
        jnp.int32(sample_begin),
        jnp.asarray(suppress_mask),
        jnp.asarray(blank_mask),
        jnp.int32(max_initial),
        cfg,
    )
    ref = _beam_update(filtered, state, cfg)

    kcfg = BeamKernelConfig(
        G=G, V=V, T=T, max_cand=MAX_CAND, eot=EOT,
        timestamp_begin=TS_BEGIN, use_timestamps=use_ts,
        single_pass=single_pass,
    )  # fmt: skip
    suppress_pen, begin_pen = build_penalty_vectors(
        V, suppress_ids, blank_ids,
        use_timestamps=use_ts, no_timestamps=NO_TS,
        timestamp_begin=TS_BEGIN, max_initial_ts_index=max_initial,
    )  # fmt: skip

    (
        k_tokens, k_src, k_lp, k_ftok, k_fscore, k_flen, k_fcount, k_completed
    ) = beam_update_pallas(
        jnp.asarray(logits),
        state.tokens,
        state.sum_logprobs,
        state.finished_tokens[0],
        state.finished_scores[0],
        state.finished_lengths[0],
        state.finished_count[0],
        state.n_tokens,
        jnp.int32(sample_begin),
        state.step,
        jnp.asarray(suppress_pen),
        jnp.asarray(begin_pen),
        cfg=kcfg,
        interpret=True,
    )  # fmt: skip

    n = n_tokens + 1
    assert np.array_equal(np.asarray(k_tokens)[:, :n], np.asarray(ref.tokens)[:, :n])
    assert np.array_equal(np.asarray(k_src), np.asarray(ref.src))
    np.testing.assert_allclose(
        np.asarray(k_lp), np.asarray(ref.sum_logprobs), rtol=0, atol=2e-5
    )
    assert int(k_fcount) == int(ref.finished_count[0])
    assert bool(k_completed) == bool(ref.completed)
    nf = int(k_fcount)
    for i in range(nf):
        ln = int(k_flen[i])
        assert ln == int(ref.finished_lengths[0, i])
        assert np.array_equal(
            np.asarray(k_ftok)[i, :ln], np.asarray(ref.finished_tokens)[0, i, :ln]
        )
        assert abs(float(k_fscore[i]) - float(ref.finished_scores[0, i])) < 2e-5


@pytest.mark.parametrize(
    "n_tokens, use_ts, rows, boost_ts",
    [
        (3, True, 5, False),   # at_begin: timestamps-only + blank suppression
        (8, True, 5, False),
        (8, True, 4, True),    # ts-mass rule triggers on some rows
        (10, False, 8, False),
        (8, True, 1, False),
    ],
)
def test_greedy_kernel_matches_jnp(n_tokens, use_ts, rows, boost_ts):
    from whisper_tpu.ops.beam_kernel import greedy_argmax_pallas

    rng = np.random.RandomState(n_tokens * 13 + rows)
    tokens = rng.randint(100, 5000, size=(rows, T)).astype(np.int32)
    if n_tokens > 4:
        # give rows timestamp histories covering the pairing rules
        tokens[0, n_tokens - 1] = TS_BEGIN + 30          # force_ts_or_eot
        if rows > 1:
            tokens[1, n_tokens - 2] = TS_BEGIN + 7       # force_non_ts
            tokens[1, n_tokens - 1] = TS_BEGIN + 12
    logits = rng.randn(rows, V).astype(np.float32)
    if boost_ts:
        logits[0, TS_BEGIN + 40 :] += 4.0  # ts mass beats every text token

    suppress_ids = [1, 2, 3, 11, 220]
    blank_ids = [220, EOT]
    max_initial = 50
    sample_begin = 3

    cfg = FusedConfig(
        n_group=rows,
        n_audio=1,
        beam_search=False,
        use_timestamps=use_ts,
        max_candidates=0,
        eot=EOT,
        timestamp_begin=TS_BEGIN,
        no_timestamps=NO_TS,
        no_speech=50363,
    )
    suppress_mask = np.zeros(V, bool)
    suppress_mask[suppress_ids] = True
    blank_mask = np.zeros(V, bool)
    blank_mask[blank_ids] = True

    filtered = _apply_filters(
        jnp.asarray(logits),
        jnp.asarray(tokens),
        jnp.int32(n_tokens),
        jnp.int32(sample_begin),
        jnp.asarray(suppress_mask),
        jnp.asarray(blank_mask),
        jnp.int32(max_initial),
        cfg,
    )
    ref_tok = np.argmax(np.asarray(filtered), axis=-1)
    lps = jax.nn.log_softmax(filtered, axis=-1)
    ref_lp = np.asarray(lps)[np.arange(rows), ref_tok]

    kcfg = BeamKernelConfig(
        G=rows, V=V, T=T, max_cand=1, eot=EOT,
        timestamp_begin=TS_BEGIN, use_timestamps=use_ts,
    )  # fmt: skip
    suppress_pen, begin_pen = build_penalty_vectors(
        V, suppress_ids, blank_ids,
        use_timestamps=use_ts, no_timestamps=NO_TS,
        timestamp_begin=TS_BEGIN, max_initial_ts_index=max_initial,
    )  # fmt: skip
    k_tok, k_lp = greedy_argmax_pallas(
        jnp.asarray(logits),
        jnp.asarray(tokens),
        jnp.int32(n_tokens),
        jnp.int32(sample_begin),
        jnp.asarray(suppress_pen),
        jnp.asarray(begin_pen),
        cfg=kcfg,
        interpret=True,
    )
    assert np.array_equal(np.asarray(k_tok), ref_tok)
    np.testing.assert_allclose(np.asarray(k_lp), ref_lp, rtol=0, atol=2e-5)
