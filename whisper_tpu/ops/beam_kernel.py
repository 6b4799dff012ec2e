"""Fused beam-search-update Pallas kernel.

The fused decode loop's per-token cost is dominated not by FLOPs but by the
~25 small XLA ops of decoding logic per iteration (logit filters, softmaxes,
top-k, candidate ranking, finished bookkeeping) — measured at ~2.5 ms/token
of near-constant overhead on top of a 2.0 ms transformer step (TODO.md).
This kernel performs the ENTIRE update — timestamp-rule filters, log-softmax,
per-beam top-(G+1), global candidate ranking with the reference's exact tie
semantics, beam selection, token-buffer update, and the patience-capped
finished pool — as ONE kernel over VMEM-resident state.

Semantics are identical to engine_fused._apply_filters + _beam_update (which
replicate the reference whisper/decoding.py:350-532); equivalence is pinned
by tests/test_beam_kernel.py in interpret mode and by the fused-engine parity
suite with WHISPER_TPU_PALLAS_BEAM=1.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = float("-inf")  # plain python float: jnp scalars would be captured
# as constants, which pallas kernels reject


class BeamKernelConfig(NamedTuple):
    G: int  # beam size
    V: int  # vocab size (logical; the kernel input is padded to V_pad)
    T: int  # token buffer length (448)
    max_cand: int  # patience-capped finished pool size
    eot: int
    timestamp_begin: int
    use_timestamps: bool
    # single_pass: replace the ~40 full-vocab VPU passes (filters, softmaxes,
    # K argmax rounds) with tiled region sweeps that compute the streaming
    # logsumexp stats and running top-K in ~2 passes total
    single_pass: bool = True
    tile: int = 1024


def _merge_topk(run_v, run_i, new_v, new_i, K):
    """Merge two sorted-desc top-K lists; ties prefer the lower vocab id.
    Ids are globally unique across the two lists (disjoint tile ranges)."""
    comb_v = jnp.concatenate([run_v, new_v], axis=1)  # (G, 2K)
    comb_i = jnp.concatenate([run_i, new_i], axis=1)
    G = comb_v.shape[0]
    col2k = jax.lax.broadcasted_iota(jnp.int32, (G, 2 * K), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1)
    out_v = jnp.full((G, K), NEG_INF, jnp.float32)
    out_i = jnp.zeros((G, K), jnp.int32)
    work = comb_v
    BIG = jnp.int32(2**30)
    for r in range(K):
        best = jnp.max(work, axis=1, keepdims=True)
        hit = work == best
        sel_id = jnp.min(jnp.where(hit, comb_i, BIG), axis=1, keepdims=True)
        out_v = jnp.where(colk == r, best, out_v)
        out_i = jnp.where(colk == r, sel_id, out_i)
        work = jnp.where(comb_i == sel_id, NEG_INF, work)
    return out_v, out_i


def _region_sweep(
    logits_ref,  # (G, V_pad) f32 ref
    suppress_pen_ref,  # (1, V_pad)
    begin_pen_ref,  # (1, V_pad)
    at_begin,  # bool scalar
    force_non_ts,  # (G, 1) bool
    force_ts_or_eot,  # (G, 1) bool
    has_ts,  # (G, 1) bool
    ts_floor,  # (G, 1) i32
    lo: int,
    hi_dynamicless: int,  # static region bounds [lo, hi) in vocab ids
    cfg: BeamKernelConfig,
    rows: int = 0,  # row count (defaults to cfg.G)
    K: int = 0,  # running top-K size (defaults to cfg.G + 1)
):
    """One tiled pass over a vocab region: filtered running top-K plus
    streaming (max, sumexp) for the region's logsumexp. Returns
    (top_vals (rows,K), top_ids (rows,K), m (rows,1), s (rows,1))."""
    import math

    G = rows or cfg.G
    K = K or cfg.G + 1
    TILE = cfg.tile
    ts_begin = cfg.timestamp_begin
    t_start = (lo // TILE) * TILE
    n_tiles = math.ceil((hi_dynamicless - t_start) / TILE)

    def body(i, carry):
        run_v, run_i, m, s = carry
        t0 = t_start + i * TILE
        l = logits_ref[:, pl.ds(t0, TILE)] + suppress_pen_ref[:, pl.ds(t0, TILE)]
        l = l + jnp.where(at_begin, begin_pen_ref[:, pl.ds(t0, TILE)], 0.0)
        ids = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 1) + t0

        valid = (ids >= lo) & (ids < hi_dynamicless) & (ids < cfg.V)
        if cfg.use_timestamps:
            l = jnp.where(force_non_ts & (ids >= ts_begin), NEG_INF, l)
            l = jnp.where(force_ts_or_eot & (ids < cfg.eot), NEG_INF, l)
            l = jnp.where(
                has_ts & (ids >= ts_begin) & (ids < ts_floor), NEG_INF, l
            )
        l = jnp.where(valid, l, NEG_INF)

        # streaming logsumexp (guarding all-masked prefixes)
        tile_max = jnp.max(l, axis=1, keepdims=True)
        new_m = jnp.maximum(m, tile_max)
        finite = new_m > NEG_INF
        s_old = jnp.where(finite & (m > NEG_INF), s * jnp.exp(m - new_m), 0.0)
        contrib = jnp.where(
            finite, jnp.sum(jnp.exp(jnp.minimum(l - new_m, 0.0)) * (l > NEG_INF), axis=1, keepdims=True), 0.0
        )
        s = s_old + contrib
        m = new_m

        # tile top-K then merge into the running top-K
        colk = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1)
        tl_v = jnp.full((G, K), NEG_INF, jnp.float32)
        tl_i = jnp.zeros((G, K), jnp.int32)
        work = l
        BIG = jnp.int32(2**30)
        for r in range(K):
            best = jnp.max(work, axis=1, keepdims=True)
            hit = work == best
            idx = jnp.min(jnp.where(hit, ids, BIG), axis=1, keepdims=True)
            tl_v = jnp.where(colk == r, best, tl_v)
            tl_i = jnp.where(colk == r, idx, tl_i)
            work = jnp.where(ids == idx, NEG_INF, work)

        run_v, run_i = _merge_topk(run_v, run_i, tl_v, tl_i, K)
        return (run_v, run_i, m, s)

    init = (
        jnp.full((G, K), NEG_INF, jnp.float32),
        jnp.zeros((G, K), jnp.int32),
        jnp.full((G, 1), NEG_INF, jnp.float32),
        jnp.zeros((G, 1), jnp.float32),
    )
    return jax.lax.fori_loop(0, n_tiles, body, init)


def _beam_update_kernel(
    # inputs
    logits_ref,  # (G, V) f32 — raw step logits
    tokens_ref,  # (G, T) i32
    sum_lp_ref,  # (G, 1) f32
    ftok_ref,  # (max_cand, T+1) i32
    fscore_ref,  # (max_cand, 1) f32
    flen_ref,  # (max_cand, 1) i32
    scalars_ref,  # SMEM (8,) i32: [n_tokens, sample_begin, step, fcount, ...]
    suppress_pen_ref,  # (1, V) f32 — static suppression (incl. no_timestamps)
    begin_pen_ref,  # (1, V) f32 — first-step penalties (blank/initial-ts rules)
    # outputs
    out_tokens_ref,  # (G, T) i32
    out_src_ref,  # (G, 1) i32
    out_sum_lp_ref,  # (G, 1) f32
    out_ftok_ref,  # (max_cand, T+1) i32
    out_fscore_ref,  # (max_cand, 1) f32
    out_flen_ref,  # (max_cand, 1) i32
    out_state_ref,  # SMEM (4,) i32: [fcount, completed, 0, 0]
    *,
    cfg: BeamKernelConfig,
):
    G, V, T = cfg.G, cfg.V, cfg.T
    K = G + 1
    ts_begin = cfg.timestamp_begin

    n_tokens = scalars_ref[0]
    sample_begin = scalars_ref[1]
    step = scalars_ref[2]
    fcount_in = scalars_ref[3]

    tokens = tokens_ref[...]  # (G, T)
    at_begin = n_tokens == sample_begin
    col_k = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1)

    # ---- per-row timestamp-rule flags (from the token history) ----
    if cfg.use_timestamps:
        pos = jax.lax.broadcasted_iota(jnp.int32, (G, T), 1)
        sampled = (pos >= sample_begin) & (pos < n_tokens)

        last_col = jnp.maximum(n_tokens - 1, 0)
        penult_col = jnp.maximum(n_tokens - 2, 0)
        last_tok = jnp.sum(
            jnp.where(pos == last_col, tokens, 0), axis=1, keepdims=True
        )  # (G, 1)
        penult_tok = jnp.sum(jnp.where(pos == penult_col, tokens, 0), axis=1, keepdims=True)
        seq_len = n_tokens - sample_begin
        last_was_ts = (seq_len >= 1) & (last_tok >= ts_begin)
        penult_was_ts = (seq_len < 2) | (penult_tok >= ts_begin)

        force_non_ts = last_was_ts & penult_was_ts
        force_ts_or_eot = last_was_ts & ~penult_was_ts
        is_ts_hist = sampled & (tokens >= ts_begin)
        has_ts = jnp.any(is_ts_hist, axis=1, keepdims=True)
        last_ts = jnp.max(jnp.where(is_ts_hist, tokens, -1), axis=1, keepdims=True)
        ts_floor = jnp.where(force_ts_or_eot, last_ts, last_ts + 1)
    else:
        zeros_b = jnp.zeros((G, 1), jnp.bool_)
        force_non_ts = zeros_b
        force_ts_or_eot = zeros_b
        has_ts = zeros_b
        ts_floor = jnp.zeros((G, 1), jnp.int32)

    if cfg.single_pass:
        # ---- tiled region sweeps: filters + streaming lse + running top-K
        # in ~2 vocab passes instead of ~40 ----
        flags = (at_begin, force_non_ts, force_ts_or_eot, has_ts, ts_floor)
        if cfg.use_timestamps:
            txt_v, txt_i, m_txt, s_txt = _region_sweep(
                logits_ref, suppress_pen_ref, begin_pen_ref, *flags,
                lo=0, hi_dynamicless=ts_begin, cfg=cfg,
            )
            ts_v, ts_i, m_ts, s_ts = _region_sweep(
                logits_ref, suppress_pen_ref, begin_pen_ref, *flags,
                lo=ts_begin, hi_dynamicless=cfg.V, cfg=cfg,
            )
            lse_txt = jnp.where(m_txt > NEG_INF, m_txt + jnp.log(s_txt), NEG_INF)
            lse_ts = jnp.where(m_ts > NEG_INF, m_ts + jnp.log(s_ts), NEG_INF)
            hi = jnp.maximum(lse_txt, lse_ts)
            lse_all = hi + jnp.log(
                jnp.exp(jnp.minimum(lse_txt - hi, 0.0)) * (lse_txt > NEG_INF)
                + jnp.exp(jnp.minimum(lse_ts - hi, 0.0)) * (lse_ts > NEG_INF)
            )
            # timestamp-mass rule in raw-logit space:
            # logsumexp_ts(lp) > max_text(lp)  <=>  lse_ts_raw > max_text_raw
            trigger = lse_ts > m_txt  # (G, 1)
            merged_v, merged_i = _merge_topk(txt_v, txt_i, ts_v, ts_i, K)
            cand_lp = jnp.where(trigger, ts_v - lse_ts, merged_v - lse_all)
            cand_tok = jnp.where(trigger, ts_i, merged_i)
        else:
            all_v, all_i, m_all, s_all = _region_sweep(
                logits_ref, suppress_pen_ref, begin_pen_ref, *flags,
                lo=0, hi_dynamicless=cfg.V, cfg=cfg,
            )
            lse_all = jnp.where(m_all > NEG_INF, m_all + jnp.log(s_all), NEG_INF)
            cand_lp = all_v - lse_all
            cand_tok = all_i
        cand_lp = jnp.where(cand_lp > NEG_INF, cand_lp, NEG_INF)  # -inf - -inf guard
    else:
        logits = logits_ref[...]  # (G, V_pad)
        Vp = logits.shape[1]
        vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (G, Vp), 1)

        # ---- filters (ApplyTimestampRules + suppression) ----
        l = logits + suppress_pen_ref[...]
        l = l + jnp.where(at_begin, begin_pen_ref[...], 0.0)
        l = jnp.where(vocab_ids >= cfg.V, NEG_INF, l)

        if cfg.use_timestamps:
            l = jnp.where(force_non_ts & (vocab_ids >= ts_begin), NEG_INF, l)
            l = jnp.where(force_ts_or_eot & (vocab_ids < cfg.eot), NEG_INF, l)
            l = jnp.where(
                has_ts & (vocab_ids >= ts_begin) & (vocab_ids < ts_floor), NEG_INF, l
            )

            # timestamp-probability-mass rule on the filtered logits
            row_max = jnp.max(l, axis=1, keepdims=True)
            lse = row_max + jnp.log(jnp.sum(jnp.exp(l - row_max), axis=1, keepdims=True))
            lp0 = l - lse
            ts_region = vocab_ids >= ts_begin
            ts_max = jnp.max(jnp.where(ts_region, lp0, NEG_INF), axis=1, keepdims=True)
            ts_mass = ts_max + jnp.log(
                jnp.sum(jnp.where(ts_region, jnp.exp(lp0 - ts_max), 0.0), axis=1, keepdims=True)
            )
            max_text = jnp.max(jnp.where(~ts_region, lp0, NEG_INF), axis=1, keepdims=True)
            l = jnp.where((ts_mass > max_text) & ~ts_region, NEG_INF, l)

        # ---- log-softmax ----
        row_max = jnp.max(l, axis=1, keepdims=True)
        lse = row_max + jnp.log(jnp.sum(jnp.exp(l - row_max), axis=1, keepdims=True))
        lp = l - lse  # (G, V_pad)

        # ---- per-beam top-(G+1): K argmax/mask rounds (ties -> lowest index,
        # matching torch.topk / lax.top_k) ----
        # (scatter/.at[].set is not lowerable in Mosaic: columns are written
        # via static-index where-masks over an iota instead)
        cand_lp = jnp.full((G, K), NEG_INF, dtype=jnp.float32)
        cand_tok = jnp.zeros((G, K), dtype=jnp.int32)
        work = lp
        for r in range(K):
            best = jnp.max(work, axis=1, keepdims=True)  # (G, 1)
            # lowest index achieving the max
            hit = work == best
            idx = jnp.min(jnp.where(hit, vocab_ids, Vp), axis=1, keepdims=True)
            cand_lp = jnp.where(col_k == r, best, cand_lp)
            cand_tok = jnp.where(col_k == r, idx, cand_tok)
            work = jnp.where(vocab_ids == idx, NEG_INF, work)

    sum_lp = sum_lp_ref[...]  # (G, 1)
    scores = sum_lp + cand_lp  # (G, K)

    # step 0: all beams identical -> keep only beam 0's candidates (the
    # reference dict keyed on full sequences collapses the duplicates)
    beam_ids = jax.lax.broadcasted_iota(jnp.int32, (G, K), 0)
    scores = jnp.where((step == 0) & (beam_ids > 0), NEG_INF, scores)

    # ---- global ranking over the G*K candidates in (beam-major, rank)
    # flat order == the reference's dict insertion order on ties. The ranking
    # walks the 2-D (G, K) matrix directly (Mosaic cannot reshape (G,K) ->
    # (1, G*K) vectors); tie-breaking uses the flat id g*K + k. ----
    n_cand = G * K
    flat_ids_2d = beam_ids * K + col_k  # (G, K) flat candidate ids
    cand_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n_cand), 1)

    order_score = jnp.zeros((1, n_cand), jnp.float32)
    order_tok = jnp.zeros((1, n_cand), jnp.int32)
    order_src = jnp.zeros((1, n_cand), jnp.int32)
    work2 = scores
    for r in range(n_cand):
        best = jnp.max(work2)  # scalar
        hit = work2 == best
        idx = jnp.min(jnp.where(hit, flat_ids_2d, n_cand))  # scalar flat id
        sel = flat_ids_2d == idx
        tok_r = jnp.sum(jnp.where(sel, cand_tok, 0))
        src_r = jnp.sum(jnp.where(sel, beam_ids, 0))
        at_r = cand_ids == r
        order_score = jnp.where(at_r, best, order_score)
        order_tok = jnp.where(at_r, tok_r, order_tok)
        order_src = jnp.where(at_r, src_r, order_src)
        work2 = jnp.where(sel, NEG_INF, work2)

    is_eot = order_tok == cfg.eot  # (1, n_cand)
    not_eot_i = (~is_eot).astype(jnp.int32)
    # exclusive prefix counts via a triangular mask (cumsum lowering is not
    # portable inside Pallas; n_cand is tiny)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n_cand, n_cand), 0)  # row = j
    cj = jax.lax.broadcasted_iota(jnp.int32, (n_cand, n_cand), 1)  # col = i
    strictly_before = (ci < cj).astype(jnp.int32)  # j < i
    live_before = jnp.sum(
        jnp.broadcast_to(not_eot_i.reshape(n_cand, 1), (n_cand, n_cand))
        * strictly_before,
        axis=0,
        keepdims=False,
    ).reshape(1, n_cand)
    live_rank = live_before  # rank among non-EOT = count of live strictly before
    eot_collected = is_eot & (live_before < G)

    # select the first G live candidates: slot_source[b] = order index of the
    # b-th live candidate
    rank_ids = jax.lax.broadcasted_iota(jnp.int32, (G, n_cand), 0)  # target slot b
    cand_pos = jax.lax.broadcasted_iota(jnp.int32, (G, n_cand), 1)
    match = (~is_eot) & (live_rank == rank_ids)  # (G, n_cand)
    slot_source = jnp.min(jnp.where(match, cand_pos, n_cand), axis=1, keepdims=True)

    def pick(row_vec):  # (1, n_cand) -> (G, 1) gathered at slot_source
        sel = cand_pos == slot_source  # (G, n_cand)
        zero = jnp.zeros((), dtype=row_vec.dtype)
        return jnp.sum(
            jnp.where(sel, jnp.broadcast_to(row_vec, (G, n_cand)), zero),
            axis=1,
            keepdims=True,
        )

    new_score = pick(order_score)
    new_tok = pick(order_tok)
    new_src = pick(order_src)

    # ---- token buffer update: gather source rows, append sampled token ----
    # tokens is small (G x T): gather rows by G comparisons
    new_tokens = jnp.zeros((G, T), jnp.int32)
    for b in range(G):
        new_tokens = jnp.where(
            new_src == b, jnp.broadcast_to(tokens[b : b + 1], (G, T)), new_tokens
        )
    pos_t = jax.lax.broadcasted_iota(jnp.int32, (G, T), 1)
    new_tokens = jnp.where(pos_t == n_tokens, jnp.broadcast_to(new_tok, (G, T)), new_tokens)

    out_tokens_ref[...] = new_tokens
    out_src_ref[...] = new_src
    out_sum_lp_ref[...] = new_score

    # ---- finished pool (patience-capped), in rank order ----
    coll_i = eot_collected.astype(jnp.int32)
    prior = jnp.sum(
        jnp.broadcast_to(coll_i.reshape(n_cand, 1), (n_cand, n_cand)) * strictly_before,
        axis=0,
    ).reshape(1, n_cand)
    slots = fcount_in + prior  # (1, n_cand)
    take = eot_collected & (slots < cfg.max_cand)

    ftok = ftok_ref[...]  # (max_cand, T+1)
    fscore = fscore_ref[...]
    flen = flen_ref[...]
    mc_ids = jax.lax.broadcasted_iota(jnp.int32, (cfg.max_cand, 1), 0)
    pos_f = jax.lax.broadcasted_iota(jnp.int32, (cfg.max_cand, T + 1), 1)
    # beam prefixes extended by one column (position n_tokens gets EOT below;
    # n_tokens < T always since the loop stops before the buffer fills)
    tokens_ext = jnp.concatenate([tokens, jnp.zeros((G, 1), jnp.int32)], axis=1)

    take_i32 = take.astype(jnp.int32)
    for i in range(n_cand):
        take_i = take_i32[0, i] == 1  # (bool arrays can't be squeezed to scalars in Mosaic)
        slot_i = slots[0, i]
        src_i = order_src[0, i]
        # finished sequence = source beam prefix + eot at column n_tokens
        seq = jnp.zeros((1, T + 1), jnp.int32)
        for b in range(G):
            seq = jnp.where(src_i == b, tokens_ext[b : b + 1], seq)
        seq = jnp.where(pos_f[:1] == n_tokens, cfg.eot, seq)
        write_row = (mc_ids == slot_i) & take_i
        ftok = jnp.where(write_row, jnp.broadcast_to(seq, (cfg.max_cand, T + 1)), ftok)
        fscore = jnp.where(write_row, order_score[0, i], fscore)
        flen = jnp.where(write_row, n_tokens + 1, flen)

    fcount = fcount_in + jnp.sum(take.astype(jnp.int32))
    out_ftok_ref[...] = ftok
    out_fscore_ref[...] = fscore
    out_flen_ref[...] = flen
    out_state_ref[0] = fcount
    out_state_ref[1] = (fcount >= cfg.max_cand).astype(jnp.int32)
    out_state_ref[2] = 0
    out_state_ref[3] = 0


def build_penalty_vectors(
    V,
    suppress_ids,
    blank_ids,
    *,
    use_timestamps,
    no_timestamps,
    timestamp_begin,
    max_initial_ts_index,
):
    """Host-side penalty vectors: `suppress` applies every step (the
    SuppressTokens set, plus <|notimestamps|> under timestamp rules);
    `begin` applies only at the first sampled position (SuppressBlank and,
    under timestamp rules, the timestamps-only + max_initial constraints)."""
    suppress = np.zeros(V, np.float32)
    suppress[list(suppress_ids)] = -np.inf
    begin = np.zeros(V, np.float32)
    begin[list(blank_ids)] = -np.inf
    if use_timestamps:
        suppress[no_timestamps] = -np.inf
        begin[:timestamp_begin] = -np.inf
        last_allowed = timestamp_begin + max_initial_ts_index
        if last_allowed + 1 < V:
            begin[last_allowed + 1 :] = -np.inf
    return suppress, begin


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def beam_update_pallas(
    logits,  # (G, V) f32
    tokens,  # (G, T) i32
    sum_logprobs,  # (G,) f32
    finished_tokens,  # (max_cand, T+1) i32
    finished_scores,  # (max_cand,) f32
    finished_lengths,  # (max_cand,) i32
    finished_count,  # i32 scalar
    n_tokens,  # i32 scalar
    sample_begin,  # i32 scalar
    step,  # i32 scalar
    suppress_pen,  # (V,) f32
    begin_pen,  # (V,) f32
    *,
    cfg: BeamKernelConfig,
    interpret: bool = False,
):
    """Returns (tokens, src, sum_logprobs, ftok, fscore, flen, fcount, completed)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, V, T, MC = cfg.G, cfg.V, cfg.T, cfg.max_cand
    # pad the vocab axis to a tile multiple; both kernel paths mask ids >= V,
    # so the pad contents are irrelevant (zeros are cheapest)
    V_pad = -(-V // cfg.tile) * cfg.tile
    if V_pad != V:
        logits = jnp.pad(logits, ((0, 0), (0, V_pad - V)))
        suppress_pen = jnp.pad(suppress_pen, (0, V_pad - V))
        begin_pen = jnp.pad(begin_pen, (0, V_pad - V))
    scalars = jnp.stack(
        [n_tokens, sample_begin, step, finished_count, 0, 0, 0, 0]
    ).astype(jnp.int32)

    kernel = functools.partial(_beam_update_kernel, cfg=cfg)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, T), jnp.int32),
            jax.ShapeDtypeStruct((G, 1), jnp.int32),
            jax.ShapeDtypeStruct((G, 1), jnp.float32),
            jax.ShapeDtypeStruct((MC, T + 1), jnp.int32),
            jax.ShapeDtypeStruct((MC, 1), jnp.float32),
            jax.ShapeDtypeStruct((MC, 1), jnp.int32),
            jax.ShapeDtypeStruct((4,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(
        logits,
        tokens,
        sum_logprobs[:, None],
        finished_tokens,
        finished_scores[:, None],
        finished_lengths[:, None],
        scalars,
        suppress_pen[None, :],
        begin_pen[None, :],
    )
    (new_tokens, src, new_lp, ftok, fscore, flen, state) = out
    return (
        new_tokens,
        src[:, 0],
        new_lp[:, 0],
        ftok,
        fscore[:, 0],
        flen[:, 0],
        state[0],
        state[1].astype(jnp.bool_),
    )


def _greedy_argmax_kernel(
    # inputs
    logits_ref,  # (B, V_pad) f32 — raw step logits
    tokens_ref,  # (B, T) i32
    scalars_ref,  # SMEM (8,) i32: [n_tokens, sample_begin, ...]
    suppress_pen_ref,  # (1, V_pad) f32
    begin_pen_ref,  # (1, V_pad) f32
    # outputs
    out_tok_ref,  # (B, 1) i32 — filtered argmax
    out_lp_ref,  # (B, 1) f32 — its log-softmax probability
    *,
    rows: int,
    cfg: BeamKernelConfig,
):
    """GreedyDecoder step as tiled region sweeps with K=1: filters + argmax +
    logsumexp in ~1 vocab pass (vs ~15 full-vocab VPU passes for the XLA
    filter/log_softmax/argmax chain). Semantics == engine_fused._apply_filters
    + argmax + log_softmax gather (reference whisper/decoding.py:280-305,
    ApplyTimestampRules)."""
    B, T = rows, cfg.T
    ts_begin = cfg.timestamp_begin
    n_tokens = scalars_ref[0]
    sample_begin = scalars_ref[1]
    tokens = tokens_ref[...]  # (B, T)
    at_begin = n_tokens == sample_begin

    if cfg.use_timestamps:
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        sampled = (pos >= sample_begin) & (pos < n_tokens)
        last_col = jnp.maximum(n_tokens - 1, 0)
        penult_col = jnp.maximum(n_tokens - 2, 0)
        last_tok = jnp.sum(jnp.where(pos == last_col, tokens, 0), axis=1, keepdims=True)
        penult_tok = jnp.sum(jnp.where(pos == penult_col, tokens, 0), axis=1, keepdims=True)
        seq_len = n_tokens - sample_begin
        last_was_ts = (seq_len >= 1) & (last_tok >= ts_begin)
        penult_was_ts = (seq_len < 2) | (penult_tok >= ts_begin)
        force_non_ts = last_was_ts & penult_was_ts
        force_ts_or_eot = last_was_ts & ~penult_was_ts
        is_ts_hist = sampled & (tokens >= ts_begin)
        has_ts = jnp.any(is_ts_hist, axis=1, keepdims=True)
        last_ts = jnp.max(jnp.where(is_ts_hist, tokens, -1), axis=1, keepdims=True)
        ts_floor = jnp.where(force_ts_or_eot, last_ts, last_ts + 1)
    else:
        zeros_b = jnp.zeros((B, 1), jnp.bool_)
        force_non_ts = zeros_b
        force_ts_or_eot = zeros_b
        has_ts = zeros_b
        ts_floor = jnp.zeros((B, 1), jnp.int32)

    flags = (at_begin, force_non_ts, force_ts_or_eot, has_ts, ts_floor)
    if cfg.use_timestamps:
        txt_v, txt_i, m_txt, s_txt = _region_sweep(
            logits_ref, suppress_pen_ref, begin_pen_ref, *flags,
            lo=0, hi_dynamicless=ts_begin, cfg=cfg, rows=B, K=1,
        )
        ts_v, ts_i, m_ts, s_ts = _region_sweep(
            logits_ref, suppress_pen_ref, begin_pen_ref, *flags,
            lo=ts_begin, hi_dynamicless=cfg.V, cfg=cfg, rows=B, K=1,
        )
        lse_txt = jnp.where(m_txt > NEG_INF, m_txt + jnp.log(s_txt), NEG_INF)
        lse_ts = jnp.where(m_ts > NEG_INF, m_ts + jnp.log(s_ts), NEG_INF)
        hi = jnp.maximum(lse_txt, lse_ts)
        lse_all = hi + jnp.log(
            jnp.exp(jnp.minimum(lse_txt - hi, 0.0)) * (lse_txt > NEG_INF)
            + jnp.exp(jnp.minimum(lse_ts - hi, 0.0)) * (lse_ts > NEG_INF)
        )
        trigger = lse_ts > m_txt  # timestamp-mass rule, raw-logit space
        # merged argmax: ties go to the lower id; text ids are always lower
        # than ts ids, so the ts side wins only strictly
        take_ts = ts_v > txt_v
        best_v = jnp.where(take_ts, ts_v, txt_v)
        best_i = jnp.where(take_ts, ts_i, txt_i)
        out_tok = jnp.where(trigger, ts_i, best_i)
        out_lp = jnp.where(trigger, ts_v - lse_ts, best_v - lse_all)
    else:
        all_v, all_i, m_all, s_all = _region_sweep(
            logits_ref, suppress_pen_ref, begin_pen_ref, *flags,
            lo=0, hi_dynamicless=cfg.V, cfg=cfg, rows=B, K=1,
        )
        lse_all = jnp.where(m_all > NEG_INF, m_all + jnp.log(s_all), NEG_INF)
        out_tok = all_i
        out_lp = all_v - lse_all

    out_tok_ref[...] = out_tok
    out_lp_ref[...] = jnp.where(out_lp > NEG_INF, out_lp, NEG_INF)  # nan guard


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def greedy_argmax_pallas(
    logits,  # (B, V) f32
    tokens,  # (B, T) i32
    n_tokens,  # i32 scalar
    sample_begin,  # i32 scalar
    suppress_pen,  # (V,) f32
    begin_pen,  # (V,) f32
    *,
    cfg: BeamKernelConfig,
    interpret: bool = False,
):
    """Filtered greedy argmax + its log-probability. Returns (tok (B,), lp (B,))."""
    from jax.experimental.pallas import tpu as pltpu

    B = logits.shape[0]
    V = cfg.V
    V_pad = -(-V // cfg.tile) * cfg.tile
    if V_pad != V:
        logits = jnp.pad(logits, ((0, 0), (0, V_pad - V)))
        suppress_pen = jnp.pad(suppress_pen, (0, V_pad - V))
        begin_pen = jnp.pad(begin_pen, (0, V_pad - V))
    scalars = jnp.stack(
        [n_tokens, sample_begin, 0, 0, 0, 0, 0, 0]
    ).astype(jnp.int32)

    kernel = functools.partial(_greedy_argmax_kernel, rows=B, cfg=cfg)
    tok, lp = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(logits, tokens, scalars, suppress_pen[None, :], begin_pen[None, :])
    return tok[:, 0], lp[:, 0]
