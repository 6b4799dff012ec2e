"""Fused on-device decoding loop.

The reference's hot loop crosses Python<->native<->accelerator boundaries on
every token (decoding.py:707-737 -> coreml.py -> coreml.mm). The host-loop
engine in decoding.py reproduces that split; this module is the TPU-first
replacement: ONE jitted function per (model, n_group, mode) that runs

    prefill -> lax.while_loop[ decode_step -> logit filters -> greedy/beam
               update -> KV-cache reorder -> finished bookkeeping ]

entirely on device. Per-token cost drops to a single XLA step with no host
synchronization; only the final token block and scores are transferred.

Fidelity: the filters and the beam bookkeeping replicate
whisper/decoding.py exactly (same candidate ordering, dict-insertion
tie-breaking via flat top-k index order, patience-capped finished set,
the sorted-walk cutoff that drops EOT candidates ranked below the
beam_size-th live candidate, and the step-0 all-beams-identical dedup).
tests/test_fused.py pins token-for-token agreement with the host engine —
which itself is pinned token-for-token against the reference.
"""

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import graphs

NEG_INF = -jnp.inf


class FusedConfig(NamedTuple):
    """Static configuration (part of the jit cache key)."""

    n_group: int
    n_audio: int  # independent streams decoded in one batch (audio-major)
    beam_search: bool  # False -> greedy/sampling
    use_timestamps: bool
    max_candidates: int  # round(beam * patience); 0 for greedy
    eot: int
    timestamp_begin: int
    no_timestamps: int
    no_speech: int
    # run the whole per-step beam update (filters + top-k + ranking +
    # finished pool) as ONE Pallas kernel instead of ~25 XLA ops; measured
    # speed-neutral (the cost is real full-vocab VPU passes, TODO.md) so it
    # stays opt-in
    pallas_beam: bool = False
    # single-pass greedy kernel (filters + argmax + logsumexp in ~1 vocab
    # pass); applies when beam_search is False and temperature == 0
    pallas_greedy: bool = False
    # cache slots actually ALLOCATED: the smallest bucket holding
    # n_initial + sample_len (static at engine.run). The default sample_len
    # (n_ctx//2) never reaches the 448-slot phase, so its buffers should
    # never exist — at large-v3 x 16 streams x beam 5 that is ~5 GB of HBM
    last_window: int = 448
    pallas_interpret: bool = False  # interpret mode off-TPU
    # int8 mode: quantize the cross-K/V INSIDE this program (one pass per
    # window) — every decode step then reads half the cross-K/V bytes.
    # Dispatching the quantization as its own program measured ~10 ms/run
    # of tunnel overhead that ate the entire saving; inline it is free.
    quantize_ckv: bool = False


class FusedState(NamedTuple):
    step: jnp.ndarray  # i32 — sampling step
    n_tokens: jnp.ndarray  # i32 — current sequence length
    tokens: jnp.ndarray  # (B, 448) i32, B = n_audio*n_group, audio-major
    cache: object  # (L, 2, B, n_cache, d) array, or per-layer tuple of
    # (2, B, n_cache, d) for unrolled decoders (L <= 8)
    src: jnp.ndarray  # (B,) i32 — pending beam reorder (global rows)
    sum_logprobs: jnp.ndarray  # (B,) f32
    completed: jnp.ndarray  # bool — all audios done
    finished_tokens: jnp.ndarray  # (A, max_cand, 449) i32
    finished_scores: jnp.ndarray  # (A, max_cand) f32
    finished_lengths: jnp.ndarray  # (A, max_cand) i32
    finished_count: jnp.ndarray  # (A,) i32
    rng: jnp.ndarray  # PRNG key (greedy sampling)
    # (B, n_cache) i32 — lazy beam reorder: row_map[b, p] is the physical
    # cache row holding logical beam b's K/V at position p (beam search only;
    # None for greedy). Cache rows never move; attention gathers through it.
    row_map: Optional[jnp.ndarray] = None


def _apply_filters(
    logits,
    tokens,
    n_tokens,
    sample_begin,
    suppress_mask,
    blank_suppress_mask,
    max_initial_ts_index,
    cfg: FusedConfig,
):
    """Vectorized equivalents of SuppressBlank / SuppressTokens /
    ApplyTimestampRules (decoding.py:450-532). logits: (G, V) f32.

    `n_tokens` may be a scalar (every row at the same length — the fused
    loop) or a (G,) vector (rows at different lengths — the speculative
    engine verifies K+1 positions whose per-row history lengths diverge
    as acceptance differs per audio). The scalar form broadcasts to the
    vector form, so both take the identical masking path."""
    G, V = logits.shape
    vocab_ids = jnp.arange(V)
    nt = jnp.broadcast_to(jnp.asarray(n_tokens, jnp.int32), (G,))

    # SuppressBlank: only at the very first sampling position
    at_begin = (nt == sample_begin)[:, None]  # (G, 1)
    logits = jnp.where(at_begin & blank_suppress_mask[None, :], NEG_INF, logits)

    # SuppressTokens: static suppression list
    logits = jnp.where(suppress_mask[None, :], NEG_INF, logits)

    if not cfg.use_timestamps:
        return logits

    ts_begin = cfg.timestamp_begin

    # suppress <|notimestamps|>
    logits = logits.at[:, cfg.no_timestamps].set(NEG_INF)

    pos = jnp.arange(tokens.shape[1])
    sampled = (pos[None, :] >= sample_begin) & (pos[None, :] < nt[:, None])  # (G, 448)
    seq_len = nt - sample_begin

    rows = jnp.arange(G)
    last_tok = tokens[rows, jnp.maximum(nt - 1, 0)]
    penult_tok = tokens[rows, jnp.maximum(nt - 2, 0)]
    last_was_ts = (seq_len >= 1) & (last_tok >= ts_begin)
    penult_was_ts = (seq_len < 2) | (penult_tok >= ts_begin)

    # timestamps come in pairs (except directly before EOT)
    force_non_ts = last_was_ts & penult_was_ts  # (G,)
    force_ts_or_eot = last_was_ts & ~penult_was_ts
    logits = jnp.where(
        force_non_ts[:, None] & (vocab_ids >= ts_begin)[None, :], NEG_INF, logits
    )
    logits = jnp.where(
        force_ts_or_eot[:, None] & (vocab_ids < cfg.eot)[None, :], NEG_INF, logits
    )

    # timestamps are non-decreasing -> the largest sampled timestamp is the
    # most recent one
    is_ts = sampled & (tokens >= ts_begin)  # (G, 448)
    has_ts = is_ts.any(axis=1)
    last_ts = jnp.max(jnp.where(is_ts, tokens, -1), axis=1)  # (G,)
    ts_floor = jnp.where(force_ts_or_eot, last_ts, last_ts + 1)
    logits = jnp.where(
        (has_ts[:, None])
        & (vocab_ids >= ts_begin)[None, :]
        & (vocab_ids < ts_floor[:, None]),
        NEG_INF,
        logits,
    )

    # the sample must start with a timestamp, bounded by max_initial_timestamp
    initial_mask = (vocab_ids < ts_begin)[None, :] | (
        vocab_ids > (ts_begin + max_initial_ts_index)
    )[None, :]
    logits = jnp.where(at_begin & initial_mask, NEG_INF, logits)

    # if the total timestamp probability mass beats every text token, only
    # timestamps may be sampled. The comparison is shift-invariant, so it
    # runs on RAW logits — materializing the (G, V) f32 log_softmax just to
    # subtract the same constant from both sides cost a full-vocab
    # write+read per step (profiled as the 34 us/step `sub`)
    ts_mass = jax.nn.logsumexp(
        jnp.where((vocab_ids >= ts_begin)[None, :], logits, NEG_INF), axis=-1
    )
    max_text = jnp.max(
        jnp.where((vocab_ids < ts_begin)[None, :], logits, NEG_INF), axis=-1
    )
    logits = jnp.where(
        (ts_mass > max_text)[:, None] & (vocab_ids < ts_begin)[None, :],
        NEG_INF,
        logits,
    )
    return logits


def _greedy_update(logits, state: FusedState, temperature, cfg: FusedConfig):
    G = logits.shape[0]  # flat batch (n_audio * n_group)
    # temperature is a traced scalar so one compiled graph serves the whole
    # fallback ladder; the RNG + categorical branch only EXECUTES when t > 0
    # (unconditional threefry sampling over the vocab costs ~1 ms/token)
    rng, sub = jax.random.split(state.rng)

    def sample(_):
        return jax.random.categorical(
            sub, logits / jnp.maximum(temperature, 1e-6)
        ).astype(jnp.int32)

    def greedy(_):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    next_tokens = jax.lax.cond(temperature == 0, greedy, sample, None)

    # logprob of the chosen token without materializing the (G, V) f32
    # log_softmax: logprob = logit - logsumexp(row) (same value, one
    # reduction instead of a full-vocab write+read)
    lse = jax.nn.logsumexp(logits, axis=-1)
    current = logits[jnp.arange(G), next_tokens] - lse
    return _greedy_finish(state, next_tokens, current, rng, cfg)


def _greedy_finish(state: FusedState, next_tokens, current, rng, cfg: FusedConfig):
    """Shared GreedyDecoder.update tail: EOT stickiness, logprob accumulation,
    token append (reference whisper/decoding.py:280-305)."""
    last = state.tokens[:, state.n_tokens - 1]
    already_done = last == cfg.eot  # reference: tokens[:, -1] == eot
    sum_logprobs = state.sum_logprobs + jnp.where(already_done, 0.0, current)
    next_tokens = jnp.where(already_done, cfg.eot, next_tokens)

    # one-hot select, NOT dynamic_update_slice: a DUS whose dynamic offset is
    # in the LANE (minormost) dimension lowers to a serialized masked rewrite
    # on TPU — profiled at 318 us/step (32% of the decode step) vs ~5 us for
    # the fused compare+select over the same bytes
    col = jnp.arange(state.tokens.shape[1]) == state.n_tokens
    tokens = jnp.where(col[None, :], next_tokens[:, None], state.tokens)
    completed = jnp.all(next_tokens == cfg.eot)
    return state._replace(
        tokens=tokens,
        n_tokens=state.n_tokens + 1,
        sum_logprobs=sum_logprobs,
        completed=completed,
        src=jnp.arange(next_tokens.shape[0], dtype=jnp.int32),
        rng=rng,
    )


def _beam_update(logits, state: FusedState, cfg: FusedConfig):
    """One BeamSearchDecoder.update (decoding.py:350-409) on device,
    vectorized over n_audio independent sampling groups (the flat batch is
    audio-major: row = audio * G + beam). Per-audio finished pools mirror the
    reference's per-audio dicts; like the reference, finished audios keep
    stepping harmlessly until all audios reach capacity."""
    A, G = cfg.n_audio, cfg.n_group
    K = G + 1  # candidates per beam
    B = A * G
    n_cand = G * K

    # per-beam top-(G+1): ties at lower token index first (torch.topk order).
    # top_k runs on RAW logits — log_softmax is a per-row shift, so the
    # selected indices and tie order are identical, and converting only the
    # K winners (logit - logsumexp == log_softmax value) skips a full-vocab
    # (B, V) f32 materialization per step
    lse = jax.nn.logsumexp(logits, axis=-1)  # (B,)
    top_raw, top_tok = jax.lax.top_k(logits, K)  # (B, K)
    top_lp = top_raw - lse[:, None]
    cand_scores = (state.sum_logprobs[:, None] + top_lp).reshape(A, n_cand)
    cand_tokens = top_tok.reshape(A, n_cand)

    # step 0: all beams of an audio are identical; the reference's dict keyed
    # on the full sequence collapses duplicates, leaving beam 0's candidates
    is_first = state.step == 0
    cand_beam = jnp.tile(jnp.repeat(jnp.arange(G), K)[None, :], (A, 1))  # (A, n_cand)
    cand_scores = jnp.where(is_first & (cand_beam > 0), NEG_INF, cand_scores)

    # global ranking per audio: flat top-k index order == (beam-major, then
    # per-beam rank) == the reference's dict insertion order on score ties
    order_scores, order_idx = jax.lax.top_k(cand_scores, n_cand)  # (A, n_cand)
    order_tokens = jnp.take_along_axis(cand_tokens, order_idx, axis=1)
    order_src = (order_idx // K).astype(jnp.int32)  # per-audio beam index

    is_eot = order_tokens == cfg.eot  # (A, n_cand)
    not_eot = (~is_eot).astype(jnp.int32)
    live_incl = jnp.cumsum(not_eot, axis=1)
    live_before = live_incl - not_eot
    live_rank = live_incl - 1  # valid where ~is_eot
    # the sorted walk stops once beam_size live candidates are saved: an EOT
    # candidate is collected only if fewer than beam_size live ones precede it
    eot_collected = is_eot & (live_before < G)

    # select the first G live candidates per audio
    select_pos = jnp.where(~is_eot, live_rank, n_cand)  # (A, n_cand)
    slot_source = jnp.argmax(
        select_pos[:, None, :] == jnp.arange(G)[None, :, None], axis=2
    )  # (A, G) index into order_* arrays

    new_scores = jnp.take_along_axis(order_scores, slot_source, axis=1)  # (A, G)
    new_tokens = jnp.take_along_axis(order_tokens, slot_source, axis=1).astype(jnp.int32)
    new_src_local = jnp.take_along_axis(order_src, slot_source, axis=1)  # (A, G)
    # global row indices for the cache/token gathers
    new_src = (new_src_local + jnp.arange(A)[:, None] * G).reshape(B)

    # lane-offset writes as one-hot selects (see _greedy_finish): the former
    # dynamic_update_slice chain here was the single most expensive op of the
    # whole decode step (318 us/step profiled, ~0 FLOPs)
    col = jnp.arange(state.tokens.shape[1]) == state.n_tokens  # (448,)
    tokens = state.tokens[new_src]
    tokens = jnp.where(col[None, :], new_tokens.reshape(B, 1), tokens)

    # fold newly finished sequences into the per-audio patience-capped
    # buffers, in rank order, while capacity remains
    prior_collected = jnp.cumsum(eot_collected.astype(jnp.int32), axis=1) - eot_collected.astype(jnp.int32)
    slot = state.finished_count[:, None] + prior_collected  # (A, n_cand)
    take = eot_collected & (slot < cfg.max_candidates)
    MC = state.finished_tokens.shape[1]
    # flat scatter rows: audio * MC + slot (OOB rows dropped)
    write_row = jnp.where(
        take, jnp.arange(A)[:, None] * MC + slot, A * MC
    ).reshape(A * n_cand)

    src_global = (order_src + jnp.arange(A)[:, None] * G).reshape(A * n_cand)
    seqs = state.tokens[src_global]  # (A*n_cand, T) prefixes before this step
    seqs = jnp.pad(seqs, ((0, 0), (0, 1)))  # (A*n_cand, T+1)
    col1 = jnp.arange(seqs.shape[1]) == state.n_tokens
    seqs = jnp.where(col1[None, :], jnp.int32(cfg.eot), seqs)

    T1 = state.finished_tokens.shape[2]
    ftok = (
        state.finished_tokens.reshape(A * MC, T1)
        .at[write_row]
        .set(seqs, mode="drop")
        .reshape(A, MC, T1)
    )
    fscore = (
        state.finished_scores.reshape(A * MC)
        .at[write_row]
        .set(order_scores.reshape(A * n_cand), mode="drop")
        .reshape(A, MC)
    )
    flen = (
        state.finished_lengths.reshape(A * MC)
        .at[write_row]
        .set(jnp.broadcast_to(state.n_tokens + 1, (A * n_cand,)), mode="drop")
        .reshape(A, MC)
    )
    fcount = state.finished_count + jnp.sum(take.astype(jnp.int32), axis=1)

    completed = jnp.all(fcount >= cfg.max_candidates)
    return state._replace(
        tokens=tokens,
        n_tokens=state.n_tokens + 1,
        sum_logprobs=new_scores.reshape(B),
        completed=completed,
        src=new_src,
        finished_tokens=ftok,
        finished_scores=fscore,
        finished_lengths=flen,
        finished_count=fcount,
    )


def fused_decode(
    dec_params,
    initial_tokens,  # (A, 448) i32, padded; first `sample_begin` cols valid
    sample_begin,  # i32 scalar
    ck,
    cv,  # (L, A, H, dh, 1500)
    sot_index,  # i32 scalar (for the no-speech probability)
    suppress_mask,  # (V,) bool
    blank_suppress_mask,  # (V,) bool
    max_initial_ts_index,  # i32 scalar
    sample_len,  # i32 scalar — max tokens to sample
    temperature,  # f32 scalar (greedy mode only)
    rng_seed,  # i32 scalar
    *,
    n_head: int,
    cfg: FusedConfig,
    cache_dtype,
):
    """Returns (tokens (B, 448), n_tokens, sum_logprobs (B,), no_speech (A,),
    finished_tokens (A, MC, 449), finished_scores, finished_lengths,
    finished_count (A,)) with B = n_audio*n_group audio-major."""
    A, G = cfg.n_audio, cfg.n_group
    B = A * G
    n_ctx = graphs.CACHE_SLOTS
    d = dec_params["tok_emb"].shape[1]
    L = dec_params["blocks"]["attn_q_w"].shape[0]

    if cfg.quantize_ckv:
        from .quant import quantize_cross_kv_math

        ck, cv = quantize_cross_kv_math(ck, cv)

    # ---- prefill (once per audio; beams are identical before sampling) ----
    prefill_tokens = initial_tokens[:, : graphs.PREFILL_LEN]  # (A, P)
    hidden, kv = graphs.prefill(
        dec_params, prefill_tokens, sample_begin, ck, cv, n_head=n_head
    )
    n_cache = min(n_ctx, cfg.last_window)
    kv_b = jnp.repeat(kv.astype(cache_dtype), G, axis=2)  # (L, 2, B, P, d)
    kv_b = kv_b[:, :, :, : min(kv_b.shape[3], n_cache)]
    if L <= 8:
        # per-layer cache tuple: indexing a stacked (L, ...) carry per layer
        # re-materialized 13 MB/step inside the decode loop (see
        # graphs.decode_step); per-layer carries are free to index
        cache = tuple(
            jax.lax.dynamic_update_slice(
                jnp.zeros((2, B, n_cache, d), dtype=cache_dtype),
                kv_b[l],
                (0, 0, 0, 0),
            )
            for l in range(L)
        )
    else:
        cache = jax.lax.dynamic_update_slice(
            jnp.zeros((L, 2, B, n_cache, d), dtype=cache_dtype),
            kv_b,
            (0, 0, 0, 0, 0),
        )

    last_hidden = hidden[:, sample_begin - 1]  # (A, d)
    sot_hidden = hidden[:, sot_index]
    first_logits = graphs.hidden_to_logits(dec_params, last_hidden)  # (A, V)
    sot_logits = graphs.hidden_to_logits(dec_params, sot_hidden)
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, cfg.no_speech]  # (A,)

    # cross K/V stays one-per-audio: decode_step groups each audio's beams

    tokens0 = jnp.repeat(initial_tokens.astype(jnp.int32), G, axis=0)  # (B, 448)

    max_cand = max(cfg.max_candidates, 1)
    state = FusedState(
        step=jnp.int32(0),
        n_tokens=sample_begin,
        tokens=tokens0,
        cache=cache,
        src=jnp.arange(B, dtype=jnp.int32),
        sum_logprobs=jnp.zeros((B,), jnp.float32),
        completed=jnp.bool_(False),
        finished_tokens=jnp.zeros((A, max_cand, n_ctx + 1), jnp.int32),
        finished_scores=jnp.full((A, max_cand), -jnp.inf, jnp.float32),
        finished_lengths=jnp.zeros((A, max_cand), jnp.int32),
        finished_count=jnp.zeros((A,), jnp.int32),
        rng=jax.random.PRNGKey(rng_seed),
        row_map=(
            jnp.tile(jnp.arange(B, dtype=jnp.int32)[:, None], (1, n_cache))
            if cfg.beam_search
            else None
        ),
    )

    use_pallas = (cfg.beam_search and cfg.pallas_beam) or (
        not cfg.beam_search and cfg.pallas_greedy
    )
    if use_pallas:
        from .ops.beam_kernel import (
            BeamKernelConfig,
            beam_update_pallas,
            greedy_argmax_pallas,
        )

        V = dec_params["tok_emb"].shape[0]
        kcfg = BeamKernelConfig(
            G=G,
            V=V,
            T=n_ctx,
            max_cand=max(cfg.max_candidates, 1),
            eot=cfg.eot,
            timestamp_begin=cfg.timestamp_begin,
            use_timestamps=cfg.use_timestamps,
        )
        # penalty vectors from the boolean masks (once per window)
        ids = jnp.arange(V)
        suppress_pen = jnp.where(suppress_mask, -jnp.inf, 0.0).astype(jnp.float32)
        begin_pen = jnp.where(blank_suppress_mask, -jnp.inf, 0.0).astype(jnp.float32)
        if cfg.use_timestamps:
            suppress_pen = suppress_pen.at[cfg.no_timestamps].set(-jnp.inf)
            begin_pen = jnp.where(ids < cfg.timestamp_begin, -jnp.inf, begin_pen)
            begin_pen = jnp.where(
                ids > cfg.timestamp_begin + max_initial_ts_index, -jnp.inf, begin_pen
            )

    def apply_update(logits_f32, st):
        if not cfg.beam_search and cfg.pallas_greedy:
            # kernel path only at temperature == 0; sampling falls back to the
            # XLA filters + categorical (one graph serves the fallback ladder,
            # lax.cond executes a single branch at runtime)
            rng, sub = jax.random.split(st.rng)

            def fast(_):
                return greedy_argmax_pallas(
                    logits_f32,
                    st.tokens,
                    st.n_tokens,
                    sample_begin,
                    suppress_pen,
                    begin_pen,
                    cfg=kcfg,
                    interpret=cfg.pallas_interpret,
                )

            def slow(_):
                filtered = _apply_filters(
                    logits_f32,
                    st.tokens,
                    st.n_tokens,
                    sample_begin,
                    suppress_mask,
                    blank_suppress_mask,
                    max_initial_ts_index,
                    cfg,
                )
                nt = jax.random.categorical(
                    sub, filtered / jnp.maximum(temperature, 1e-6)
                ).astype(jnp.int32)
                lps = jax.nn.log_softmax(filtered, axis=-1)
                cur = lps[jnp.arange(filtered.shape[0]), nt]
                return nt, cur

            next_tokens, current = jax.lax.cond(temperature == 0, fast, slow, None)
            return _greedy_finish(st, next_tokens, current, rng, cfg)
        if cfg.beam_search and cfg.pallas_beam:
            (
                new_tokens,
                src,
                new_lp,
                ftok,
                fscore,
                flen,
                fcount,
                completed,
            ) = beam_update_pallas(
                logits_f32,
                st.tokens,
                st.sum_logprobs,
                st.finished_tokens[0],  # kernel is single-audio (A == 1)
                st.finished_scores[0],
                st.finished_lengths[0],
                st.finished_count[0],
                st.n_tokens,
                sample_begin,
                st.step,
                suppress_pen,
                begin_pen,
                cfg=kcfg,
                interpret=cfg.pallas_interpret,
            )
            return st._replace(
                tokens=new_tokens,
                n_tokens=st.n_tokens + 1,
                sum_logprobs=new_lp,
                completed=completed,
                src=src,
                finished_tokens=ftok[None],
                finished_scores=fscore[None],
                finished_lengths=flen[None],
                finished_count=fcount[None],
            )

        filtered = _apply_filters(
            logits_f32,
            st.tokens,
            st.n_tokens,
            sample_begin,
            suppress_mask,
            blank_suppress_mask,
            max_initial_ts_index,
            cfg,
        )
        if cfg.beam_search:
            return _beam_update(filtered, st, cfg)
        return _greedy_update(filtered, st, temperature, cfg)

    # step 0 uses the prefill's last-position logits (per audio, repeated
    # across the audio's group)
    state = apply_update(jnp.repeat(first_logits, G, axis=0), state)
    state = state._replace(step=jnp.int32(1))

    def cond(st: FusedState):
        return (~st.completed) & (st.step < sample_len) & (st.n_tokens < n_ctx)

    # pre-slice per-layer weights and cross-K/V OUTSIDE the while loop for
    # shallow (unrolled) decoders: XLA kept re-materializing the per-layer
    # slices inside the loop body every step (see graphs.decode_step)
    if L <= 8:
        step_dec = dict(
            dec_params,
            blocks=tuple(
                jax.tree.map(lambda a, l=l: a[l], dec_params["blocks"])
                for l in range(L)
            ),
        )
        step_ck = tuple(graphs.ckv_layer(ck, l) for l in range(L))
        step_cv = tuple(graphs.ckv_layer(cv, l) for l in range(L))
    else:
        step_dec, step_ck, step_cv = dec_params, ck, cv

    def make_body(window):
        W = n_cache if window is None else window

        def body(st: FusedState):
            pos = st.n_tokens - 1
            step_toks = st.tokens[jnp.arange(B), pos]
            row_map = st.row_map
            if cfg.beam_search:
                # the slot decode_step writes this step belongs to the
                # CURRENT logical beams: physical row == logical row
                # (one-hot select — lane-offset DUS is pathological on TPU)
                row_map = jnp.where(
                    (jnp.arange(row_map.shape[1]) == pos)[None, :],
                    jnp.arange(B, dtype=jnp.int32)[:, None],
                    row_map,
                )
            logits, cache = graphs.decode_step(
                step_dec,
                step_toks,
                pos,
                st.cache,
                st.src,
                step_ck,
                step_cv,
                n_head=n_head,
                reorder=False,  # beam reorder is lazy via row_map
                window=window,
                row_map=(
                    jax.lax.slice(row_map, (0, 0), (B, W))
                    if cfg.beam_search
                    else None
                ),
            )
            st = st._replace(
                cache=cache, src=jnp.arange(B, dtype=jnp.int32), row_map=row_map
            )
            st = apply_update(logits, st)
            if cfg.beam_search:
                # fold this step's beam selection into the row map (tiny)
                st = st._replace(
                    row_map=jnp.take(st.row_map, st.src, axis=0),
                    src=jnp.arange(B, dtype=jnp.int32),
                )
            return st._replace(step=st.step + 1)

        return body

    # bucketed phases: while occupancy fits in the first `window` cache
    # slots, attention reads / the beam-reorder gather / the slab write-back
    # all run at `window` size instead of the full 448 — 2.6x on large-v3
    # batched decode, where cache movement (not math) dominated the profile.
    # A loop whose entry condition is already false never runs: short
    # decodes (the common case) stay entirely in the small-window phases.
    # dict.fromkeys dedupes while keeping order: when n_cache is itself 128
    # or 256 the full-window phase must be emitted ONCE, not once per alias
    # (a duplicate while_loop never iterates but still doubles compile time)
    for window in dict.fromkeys((128, 256, n_cache)):
        if window > n_cache:
            continue
        if window >= n_cache:
            state = jax.lax.while_loop(cond, make_body(None), state)
        else:
            # decode_step writes slot n_tokens-1, so the phase is valid
            # while n_tokens <= window
            state = jax.lax.while_loop(
                lambda st, w=window: cond(st) & (st.n_tokens < w),
                make_body(window),
                state,
            )

    return (
        state.tokens,
        state.n_tokens,
        state.sum_logprobs,
        no_speech_prob,
        state.finished_tokens,
        state.finished_scores,
        state.finished_lengths,
        state.finished_count,
    )


class FusedEngine:
    """Caches one jitted fused_decode per (n_group, mode) for a model."""

    def __init__(self, model, weights: str = ""):
        import os

        self.model = model
        self._jitted = {}
        # weight-only int8 decode (whisper_tpu/quant.py): halves the HBM
        # weight reads the bandwidth-bound decode step pays for. Opt-in
        # (near-lossless but not token-parity-guaranteed vs bf16):
        # FusedEngine(model, weights="int8") or WHISPER_TPU_WEIGHTS=int8.
        self._weights_mode = weights or os.environ.get("WHISPER_TPU_WEIGHTS", "")
        self._dec_params = None
        # device-resident suppress/blank masks keyed by the id tuples: the
        # masks are identical for every window of a transcription, and each
        # host->device put is a round trip on remote-PJRT backends
        self._mask_cache = {}
        # same for the small scalar arguments (sot_index, sample_len, ...):
        # they repeat across windows, and six tiny puts per window were
        # measurable tunnel overhead
        self._scalar_cache = {}

    def _scalar(self, dtype, value, *, cache=True):
        """Device-resident scalar. `cache=False` for values that vary per call
        (e.g. fresh RNG seeds): the cache is permanent, and a new entry per
        decoded window would pin device buffers without bound in long-running
        servers."""
        if not cache:
            return jnp.asarray(value, dtype=dtype)
        key = (dtype, value)
        if key not in self._scalar_cache:
            self._scalar_cache[key] = jnp.asarray(value, dtype=dtype)
        return self._scalar_cache[key]

    def _decoder_params(self):
        """The decoder tree the fused program consumes: the model's bf16
        params, or (weights='int8') a one-time-quantized copy whose step-loop
        weights are int8 with '@scale' siblings (the bf16 originals stay on
        the model for the fidelity/timing paths)."""
        if self._dec_params is None:
            dec = self.model.params["decoder"]
            if self._weights_mode == "int8":
                from .quant import quantize_decoder

                dec = quantize_decoder(dec)
            elif self._weights_mode not in ("", "bf16", "bfloat16"):
                raise ValueError(
                    f"unknown weights mode {self._weights_mode!r} (expected 'int8')"
                )
            self._dec_params = dec
        return self._dec_params

    def _prepare_inputs(self, initial_tokens, suppress_ids, blank_ids):
        """Shared run() input prep for the fused and speculative engines:
        2D-ify + validate the initial tokens, build the padded 448-token
        block, and populate the per-value suppress/blank device-mask cache.
        Returns (initial_tokens, n_audio, n_initial, toks, suppress, blank)."""
        V = self.model.dims.n_vocab
        n_ctx = graphs.CACHE_SLOTS
        # initial_tokens: one token list shared by all audios, or an
        # (n_audio, len) array (rows may differ e.g. after language detection)
        initial_tokens = np.asarray(initial_tokens, dtype=np.int32)
        if initial_tokens.ndim == 1:
            initial_tokens = initial_tokens[None, :]
        n_audio, n_initial = initial_tokens.shape
        if n_initial > graphs.PREFILL_LEN:
            # the prefill graph reads only the first PREFILL_LEN tokens; a
            # longer prompt would be SILENTLY truncated and the step-0
            # logits taken from the wrong position (the reference caps
            # prompts at n_text_ctx//2-1 = 223, transcribe.py:242)
            raise ValueError(
                f"initial tokens ({n_initial}) exceed the "
                f"{graphs.PREFILL_LEN}-token prefill window; trim the prompt"
            )
        toks = np.zeros((n_audio, n_ctx), dtype=np.int32)
        toks[:, :n_initial] = initial_tokens
        mask_key = (tuple(suppress_ids), tuple(blank_ids), V)
        if mask_key not in self._mask_cache:
            suppress_mask = np.zeros(V, dtype=bool)
            suppress_mask[list(suppress_ids)] = True
            blank_mask = np.zeros(V, dtype=bool)
            blank_mask[list(blank_ids)] = True
            self._mask_cache[mask_key] = (
                jnp.asarray(suppress_mask),
                jnp.asarray(blank_mask),
            )
        suppress_mask, blank_mask = self._mask_cache[mask_key]
        return (
            initial_tokens, n_audio, n_initial,
            jnp.asarray(toks), suppress_mask, blank_mask,
        )

    def _jit_options(self, cfg: FusedConfig) -> dict:
        """Extra jax.jit kwargs (e.g. in_shardings); subclass hook so the
        sharded engine reuses the exact same cfg/bucket/kernel logic."""
        return {}

    def _get(self, cfg: FusedConfig):
        key = cfg
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                partial(
                    fused_decode,
                    n_head=self.model.dims.n_text_head,
                    cfg=cfg,
                    cache_dtype=self.model.compute_dtype,
                ),
                **self._jit_options(cfg),
            )
        return self._jitted[key]

    def warmup(self, initial_tokens, **kwargs):
        """Compile-and-load the fused decode program for a configuration
        before real audio arrives, by running it once on ZERO cross-KV.

        The decode program's input shapes don't depend on any encoder
        output, so a server/daemon can dispatch this concurrently with the
        encoder's own warmup and the two compilations overlap (the CoreML
        analog is the reference's model-load step, README.md:26-27; on
        remote-PJRT backends compilation is deferred to first execution, so
        plain `jax.jit` alone doesn't front-load it). Accepts exactly
        `run`'s keyword arguments; n_audio is taken from `initial_tokens`'s
        leading dimension.
        """
        dims = self.model.dims
        initial_tokens = np.asarray(initial_tokens, dtype=np.int32)
        n_audio = initial_tokens.shape[0] if initial_tokens.ndim == 2 else 1
        L, H = dims.n_text_layer, dims.n_text_head
        dh = dims.n_text_state // H
        zkv = jnp.zeros(
            (L, n_audio, H, dh, dims.n_audio_ctx), self.model.compute_dtype
        )
        return self.run(initial_tokens, zkv, zkv, **kwargs)

    def run(
        self,
        initial_tokens,
        ck,
        cv,
        *,
        sot_index: int,
        suppress_ids,
        blank_ids,
        max_initial_ts_index: Optional[int],
        sample_len: int,
        n_group: int,
        beam_search: bool,
        max_candidates: int,
        use_timestamps: bool,
        temperature: float,
        eot: int,
        timestamp_begin: int,
        no_timestamps: int,
        no_speech: int,
        rng_seed: int = 0,
    ):
        import os

        n_ctx = graphs.CACHE_SLOTS
        (
            initial_tokens, n_audio, n_initial, toks, suppress_mask, blank_mask,
        ) = self._prepare_inputs(initial_tokens, suppress_ids, blank_ids)

        # The single-pass fused-update Pallas kernel (tiled region sweeps:
        # running top-K + streaming logsumexp in ~2 vocab passes instead of
        # ~40) matches the jnp path bit-for-bit, but once the rest of the
        # loop shrank it measured 7.7% SLOWER end-to-end than the XLA-fused
        # jnp update (102.9 vs 110.8 ms / 96 turbo beam-5 steps, transfer-
        # synced on v5e) — the update was never the bottleneck. Default OFF;
        # WHISPER_TPU_PALLAS_BEAM=1 opts in. The kernel is single-audio.
        env = os.environ.get("WHISPER_TPU_PALLAS_BEAM", "")
        pallas_beam = env == "1"
        max_tokens = min(n_initial + sample_len, n_ctx)
        last_window = next(w for w in (128, 256, n_ctx) if max_tokens <= w)
        cfg = FusedConfig(
            n_group=n_group,
            n_audio=n_audio,
            beam_search=beam_search,
            use_timestamps=use_timestamps,
            max_candidates=max_candidates if beam_search else 0,
            eot=eot,
            timestamp_begin=timestamp_begin,
            no_timestamps=no_timestamps,
            no_speech=no_speech,
            pallas_beam=pallas_beam and beam_search and n_audio == 1,
            pallas_greedy=pallas_beam and not beam_search,
            pallas_interpret=jax.default_backend() != "tpu",
            last_window=last_window,
            quantize_ckv=self._weights_mode == "int8",
        )
        fn = self._get(cfg)

        from . import profiling

        with profiling.timed("fused_decode"):
            out = fn(
                self._decoder_params(),
                toks,
                self._scalar("int32", n_initial),
                ck,
                cv,
                self._scalar("int32", sot_index),
                suppress_mask,
                blank_mask,
                self._scalar(
                    "int32",
                    max_initial_ts_index if max_initial_ts_index is not None else n_ctx,
                ),
                self._scalar("int32", sample_len),
                self._scalar("float32", float(temperature)),
                self._scalar("int32", rng_seed, cache=rng_seed == 0),
            )
            # device_get pre-issues copy_to_host_async for every leaf before
            # blocking: ONE pipelined round trip instead of a serial RTT per
            # output array (8 leaves x tunnel RTT dominated end-to-end latency)
            out = jax.device_get(out)
        return out
