"""Speculative greedy decoding: a small draft model proposes K tokens, the
target model verifies all K (+1 bonus) in ONE decoder pass.

Why this is the right TPU serving shape: the autoregressive decode step is
HBM-bandwidth-bound on the *weight* sweep (every step streams the full
decoder + logits-head weights past a few KB of activations — see quant.py).
A K+1-token verify chunk (graphs.decode_chunk) pays that sweep ONCE for K+1
positions, so with acceptance rate a the per-token weight traffic drops by
~(1 + a*K)x. The draft runs the same fused-loop structure at a fraction of
the size (e.g. tiny drafting for turbo: 4 layers x 384 wide vs 4 x 1280).

Token-level parity is BY CONSTRUCTION: every emitted token is the argmax of
the TARGET model's filtered logits given the same prefix — the draft only
influences how many positions each verify pass can confirm, never what is
emitted. tests/test_speculative.py pins spec == fused-greedy for an
arbitrary draft (including a deliberately useless random one). Precision
caveat: "the target's logits" here means the verify chunk's numerics; in
reduced-precision modes (weights='int8') the chunked matmul accumulation
can flip rare near-tie argmaxes vs the step loop (see PARITY.md).

Greedy (temperature == 0) only: Whisper transcription decodes at t == 0
first and only re-decodes windows at t > 0 on quality-gate failure
(/root/reference/whisper/transcribe.py:120-169), so the hot path is greedy.
The t > 0 fallback ladder should use the plain FusedEngine.

No reference analog: the reference decodes strictly one token per Decoder1
graph run (/root/reference/coreml/decoder.py:241-259). This module is a
beyond-reference TPU serving extension.
"""

from functools import partial
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .engine_fused import FusedConfig, FusedEngine, _apply_filters
from .models import graphs


class SpecState(NamedTuple):
    tokens: jnp.ndarray  # (A, 448) i32 — verified tokens; [n_b, n_b+K) holds
    # the current round's draft candidates (read-masked everywhere)
    n: jnp.ndarray  # (A,) i32 — verified tokens per row (incl. initial)
    p_d: jnp.ndarray  # (A,) i32 — positions correctly fed to the draft
    done: jnp.ndarray  # (A,) bool
    sum_logprobs: jnp.ndarray  # (A,) f32
    cache_t: jnp.ndarray  # (Lt, 2, A, C, d_t) target self-attention K/V
    cache_d: jnp.ndarray  # (Ld, 2, A, C, d_d) draft self-attention K/V
    rounds: jnp.ndarray  # (A,) i32 — verify rounds the row participated in


def _greedy_pick(filtered):
    """argmax + its logprob without materializing log_softmax (mirrors
    engine_fused._greedy_update's t == 0 branch)."""
    g = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
    lse = jax.nn.logsumexp(filtered, axis=-1)
    lp = filtered[jnp.arange(filtered.shape[0]), g] - lse
    return g, lp


def fused_decode_spec(
    dec_t,
    dec_d,
    initial_tokens,  # (A, 448) i32, padded; first sample_begin cols valid
    sample_begin,  # i32 scalar
    ck_t,
    cv_t,  # (Lt, A, Ht, dht, T) target cross K/V
    ck_d,
    cv_d,  # (Ld, A, Hd, dhd, T) draft cross K/V
    sot_index,
    suppress_mask,
    blank_suppress_mask,
    max_initial_ts_index,
    sample_len,
    *,
    n_head_t: int,
    n_head_d: int,
    cfg: FusedConfig,
    K: int,
    cache_dtype,
):
    """Speculative greedy decode. Returns the same tuple as
    engine_fused.fused_decode in greedy mode: (tokens (A, 448), n_tokens,
    sum_logprobs (A,), no_speech (A,), finished_* dummies)."""
    A = cfg.n_audio
    n_ctx = graphs.CACHE_SLOTS
    # caches allocate at the BUCKETED width (128/256/448) holding
    # sample_begin + sample_len + K + 1 — the verify chunk's reads, its
    # one-hot scatter and every draft step's cache sweep then scale with the
    # window actually decoded instead of the full 448 slots (the fused
    # loop's cfg.last_window economics); the token block stays (A, 448)
    n_cache = min(n_ctx, cfg.last_window)
    rows = jnp.arange(A)
    col = jnp.arange(n_ctx)[None, :]  # (1, 448)
    eot = cfg.eot

    if cfg.quantize_ckv:
        # int8 mode quantizes BOTH models' cross-K/V inside this program —
        # every draft step and verify pass then reads half the bytes (the
        # same inline-pass economics as engine_fused.fused_decode)
        from .quant import quantize_cross_kv_math

        ck_t, cv_t = quantize_cross_kv_math(ck_t, cv_t)
        ck_d, cv_d = quantize_cross_kv_math(ck_d, cv_d)

    def filters(logits, tokens, nt):
        return _apply_filters(
            logits,
            tokens,
            nt,
            sample_begin,
            suppress_mask,
            blank_suppress_mask,
            max_initial_ts_index,
            cfg,
        )

    # ---- prefills (target + draft share the loop-free structure) ----
    def prefill_model(dec, ck, cv, n_head):
        hidden, kv = graphs.prefill(
            dec, initial_tokens[:, : graphs.PREFILL_LEN], sample_begin, ck, cv,
            n_head=n_head,
        )
        d = dec["tok_emb"].shape[1]
        L = kv.shape[0]
        kv = kv[:, :, :, : min(kv.shape[3], n_cache)]
        if L <= 8:
            # per-layer tuple carry: indexing a stacked (L, ...) loop-carried
            # cache per layer re-materializes a copy chain every iteration
            # (see graphs.decode_step) — per-layer carries are free to index
            cache = tuple(
                jax.lax.dynamic_update_slice(
                    jnp.zeros((2, A, n_cache, d), dtype=cache_dtype),
                    kv[l].astype(cache_dtype),
                    (0, 0, 0, 0),
                )
                for l in range(L)
            )
        else:
            cache = jax.lax.dynamic_update_slice(
                jnp.zeros((L, 2, A, n_cache, d), dtype=cache_dtype),
                kv.astype(cache_dtype),
                (0, 0, 0, 0, 0),
            )
        return hidden, cache

    def presliced(dec, ck, cv):
        # hoist per-layer weight / cross-K/V slices OUTSIDE the while loops
        # (mirrors engine_fused.fused_decode; scan xs re-slice per iteration)
        L = (
            dec["blocks"]["attn_q_w"].shape[0]
            if not isinstance(dec["blocks"], (list, tuple))
            else len(dec["blocks"])
        )
        if L > 8:
            return dec, ck, cv
        dec2 = dict(
            dec,
            blocks=tuple(
                jax.tree.map(lambda a, l=l: a[l], dec["blocks"]) for l in range(L)
            ),
        )
        ck2 = tuple(graphs.ckv_layer(ck, l) for l in range(L))
        cv2 = tuple(graphs.ckv_layer(cv, l) for l in range(L))
        return dec2, ck2, cv2

    hidden_t, cache_t = prefill_model(dec_t, ck_t, cv_t, n_head_t)
    _, cache_d = prefill_model(dec_d, ck_d, cv_d, n_head_d)
    step_dec_t, step_ck_t, step_cv_t = presliced(dec_t, ck_t, cv_t)
    step_dec_d, step_ck_d, step_cv_d = presliced(dec_d, ck_d, cv_d)

    first_logits = graphs.hidden_to_logits(dec_t, hidden_t[:, sample_begin - 1])
    sot_logits = graphs.hidden_to_logits(dec_t, hidden_t[:, sot_index])
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, cfg.no_speech]

    tokens0 = initial_tokens.astype(jnp.int32)

    # ---- step 0: the target's prefill logits choose token[sample_begin] ----
    g0, lp0 = _greedy_pick(filters(first_logits, tokens0, sample_begin))
    tokens0 = jnp.where(col == sample_begin, g0[:, None], tokens0)
    limit = jnp.minimum(sample_begin + sample_len, n_cache - K - 1)
    n0 = jnp.full((A,), sample_begin + 1, jnp.int32)
    done0 = (g0 == eot) | (n0 >= limit)

    state = SpecState(
        tokens=tokens0,
        n=n0,
        p_d=jnp.full((A,), sample_begin, jnp.int32),
        done=done0,
        sum_logprobs=lp0,
        cache_t=cache_t,
        cache_d=cache_d,
        rounds=jnp.zeros((A,), jnp.int32),
    )

    def outer_cond(st: SpecState):
        return jnp.any(~st.done)

    def outer_body(st: SpecState):
        n, done = st.n, st.done

        # ---- draft phase: propose candidates for positions n .. n+K-1 ----
        def d_cond(c):
            tokens, p_d, _ = c
            return jnp.any(~done & (p_d < n + K - 1))

        def d_body(c):
            tokens, p_d, cache_d = c
            active = ~done & (p_d < n + K - 1)
            tok_in = tokens[rows, jnp.clip(p_d, 0, n_cache - 1)][:, None]  # (A,1)
            logits_d, cache_d = graphs.decode_chunk(
                step_dec_d, tok_in, p_d, cache_d, step_ck_d, step_cv_d,
                n_head=n_head_d, active=active,
            )
            prop, _ = _greedy_pick(filters(logits_d[:, 0], tokens, p_d + 1))
            write_pos = p_d + 1
            store = (active & (write_pos >= n))[:, None]  # only candidates
            tokens = jnp.where(
                store & (col == write_pos[:, None]), prop[:, None], tokens
            )
            return (tokens, jnp.where(active, p_d + 1, p_d), cache_d)

        tokens, p_d, cache_d = jax.lax.while_loop(
            d_cond, d_body, (st.tokens, st.p_d, st.cache_d)
        )

        # ---- verify phase: one target pass over [t_{n-1}, c_0 .. c_{K-1}] ----
        vidx = jnp.clip(n[:, None] - 1 + jnp.arange(K + 1)[None, :], 0, n_cache - 1)
        t_in = tokens[rows[:, None], vidx]  # (A, K+1)
        logits_v, cache_t = graphs.decode_chunk(
            step_dec_t, t_in, n - 1, st.cache_t, step_ck_t, step_cv_t,
            n_head=n_head_t, active=~done,
        )
        # one BATCHED filter+argmax pass over all K+1 positions: the K+1
        # sequential (A, V) passes were ~0.3 ms/round of small-op latency;
        # _apply_filters natively takes a per-row position vector
        Kp1 = K + 1
        toks_rep = jnp.repeat(tokens, Kp1, axis=0)  # (A*(K+1), 448)
        nt_vec = (n[:, None] + jnp.arange(Kp1)[None, :]).reshape(-1)
        g_flat, lp_flat = _greedy_pick(
            filters(logits_v.reshape(A * Kp1, -1), toks_rep, nt_vec)
        )
        g = g_flat.reshape(A, Kp1)  # (A, K+1) target argmax per position
        lp = lp_flat.reshape(A, Kp1)

        cand = t_in[:, 1:]  # (A, K) the draft's candidates
        match = (g[:, :K] == cand).astype(jnp.int32)
        m = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (A,) accepted prefix

        # keep tokens g_0 .. g_m, truncated at the first EOT and at `limit`
        alive = ~done
        keep_list = []
        for j in range(K + 1):
            keep_j = alive & (j <= m) & (n + j < limit)
            alive = keep_j & (g[:, j] != eot)
            keep_list.append(keep_j)
        keep = jnp.stack(keep_list, axis=1)  # (A, K+1)
        accept_len = jnp.sum(keep.astype(jnp.int32), axis=1)

        hit_eot = jnp.any(keep & (g == eot), axis=1)
        n_new = n + accept_len
        done_new = done | hit_eot | (n_new >= limit)

        # single one-hot write of all accepted tokens (at most one j per col)
        wcol = jnp.clip(n[:, None] + jnp.arange(Kp1)[None, :], 0, n_ctx - 1)
        sel = keep[:, :, None] & (col[:, None, :] == wcol[:, :, None])  # (A,K+1,448)
        vals = jnp.einsum("akc,ak->ac", sel.astype(jnp.int32), g)
        tokens = jnp.where(jnp.any(sel, axis=1), vals, tokens)
        sum_lp = st.sum_logprobs + jnp.sum(jnp.where(keep, lp, 0.0), axis=1)

        # the draft's cache is correct through position n+m-1 (it fed the
        # accepted candidates itself); position n+m holds a rejected
        # candidate's K/V unless everything was accepted
        p_d_new = jnp.minimum(p_d, n + m)

        return SpecState(
            tokens=tokens,
            n=n_new,
            p_d=p_d_new,
            done=done_new,
            sum_logprobs=sum_lp,
            cache_t=cache_t,
            cache_d=cache_d,
            rounds=st.rounds + (~done).astype(jnp.int32),
        )

    state = jax.lax.while_loop(outer_cond, outer_body, state)

    # EOT-pad rows to the global length (the fused greedy loop keeps
    # appending EOT to finished rows until ALL rows finish — same contract),
    # and zero the stale candidate region beyond it
    n_tokens = jnp.max(state.n)
    tokens = state.tokens
    row_n = state.n[:, None]
    tokens = jnp.where(
        col >= row_n, jnp.where(col < n_tokens, eot, 0), tokens
    )

    max_cand = max(cfg.max_candidates, 1)
    return (
        tokens,
        n_tokens,
        state.sum_logprobs,
        no_speech_prob,
        jnp.zeros((A, max_cand, n_ctx + 1), jnp.int32),
        jnp.full((A, max_cand), -jnp.inf, jnp.float32),
        jnp.zeros((A, max_cand), jnp.int32),
        jnp.zeros((A,), jnp.int32),
        # telemetry (popped by SpeculativeEngine.run before returning the
        # fused-contract 8-tuple): per-row verify rounds + verified lengths
        state.rounds,
        state.n,
    )


class SpeculativeEngine:
    """Greedy speculative decoding: `model` verifies, `draft_model` proposes.

    Mirrors FusedEngine.run's greedy API with two extra positional inputs
    (the draft model's cross K/V — use frontend.clip_frontend_spec to get
    both models' cross K/V from one device program). Both models must share
    a tokenizer (same n_vocab); the practical draft for turbo/large-v3 is
    tiny/base (or a distil-whisper decoder once real weights exist).
    """

    def __init__(self, model, draft_model, k: int = 4, weights: str = ""):
        if model.dims.n_vocab != draft_model.dims.n_vocab:
            raise ValueError(
                "target and draft must share a tokenizer/vocab "
                f"({model.dims.n_vocab} vs {draft_model.dims.n_vocab})"
            )
        self.model = model
        self.draft = draft_model
        self.k = int(k)
        import os

        self._weights_mode = weights or os.environ.get("WHISPER_TPU_WEIGHTS", "")
        self._dec_params = None
        self._draft_dec_params = None
        self._jitted = {}
        self._mask_cache = {}
        self._scalar_cache = {}
        # per-run acceptance telemetry (rounds / emitted / draft_acceptance
        # per row), set after every run() — the production signal for how
        # well the draft tracks the target on the serving domain
        self.last_stats: Optional[dict] = None

    # the scalar/mask device caches mirror FusedEngine's (one put per value,
    # not per window); same for the int8 weights mode
    _scalar = FusedEngine._scalar
    _decoder_params = FusedEngine._decoder_params
    _prepare_inputs = FusedEngine._prepare_inputs

    def _draft_decoder_params(self):
        """The draft decoder tree, quantized alongside the target in int8
        mode — the draft step is bandwidth-bound on the SAME weight-read
        economics (its (V, d) logits head dominates its ~75 us roofline)."""
        if self._draft_dec_params is None:
            dec = self.draft.params["decoder"]
            if self._weights_mode == "int8":
                from .quant import quantize_decoder

                dec = quantize_decoder(dec)
            self._draft_dec_params = dec
        return self._draft_dec_params

    def _jit_options(self, cfg: FusedConfig) -> dict:
        """Extra jax.jit kwargs; subclass hook for the sharded engine
        (parallel.serve.DataParallelSpeculativeEngine), mirroring
        FusedEngine._jit_options."""
        return {}

    def _get(self, cfg: FusedConfig):
        if cfg not in self._jitted:
            fn = partial(
                fused_decode_spec,
                n_head_t=self.model.dims.n_text_head,
                n_head_d=self.draft.dims.n_text_head,
                cfg=cfg,
                K=self.k,
                cache_dtype=self.model.compute_dtype,
            )
            # partials have no __name__, which files the persistent-cache
            # entry as 'jit__unknown'; name it so cache hygiene stays legible
            fn.__name__ = "fused_decode_spec"
            self._jitted[cfg] = jax.jit(fn, **self._jit_options(cfg))
        return self._jitted[cfg]

    def warmup(self, initial_tokens, **kwargs):
        dims_t, dims_d = self.model.dims, self.draft.dims
        initial_tokens = np.asarray(initial_tokens, dtype=np.int32)
        n_audio = initial_tokens.shape[0] if initial_tokens.ndim == 2 else 1

        def zkv(dims, dtype):
            H = dims.n_text_head
            return jnp.zeros(
                (dims.n_text_layer, n_audio, H, dims.n_text_state // H,
                 dims.n_audio_ctx),
                dtype,
            )

        # per-model dtypes: each model's cross_kv outputs its OWN compute
        # dtype, and a warmup traced at the wrong dtype would silently
        # recompile on the first real request
        t_dt, d_dt = self.model.compute_dtype, self.draft.compute_dtype
        return self.run(
            initial_tokens,
            zkv(dims_t, t_dt), zkv(dims_t, t_dt),
            zkv(dims_d, d_dt), zkv(dims_d, d_dt),
            **kwargs,
        )

    def run(
        self,
        initial_tokens,
        ck,
        cv,
        draft_ck,
        draft_cv,
        *,
        sot_index: int,
        suppress_ids,
        blank_ids,
        max_initial_ts_index: Optional[int],
        sample_len: int,
        use_timestamps: bool,
        eot: int,
        timestamp_begin: int,
        no_timestamps: int,
        no_speech: int,
        temperature: float = 0.0,
        n_group: int = 1,
        beam_search: bool = False,
        max_candidates: int = 0,
        rng_seed: int = 0,
    ):
        if beam_search or n_group != 1:
            raise ValueError("speculative decoding is greedy-only (n_group=1)")
        if temperature != 0.0:
            raise ValueError(
                "speculative decoding runs at temperature 0; use FusedEngine "
                "for the t > 0 fallback ladder"
            )
        n_ctx = graphs.CACHE_SLOTS
        (
            initial_tokens, n_audio, n_initial, toks, suppress_mask, blank_mask,
        ) = self._prepare_inputs(initial_tokens, suppress_ids, blank_ids)
        if n_initial + sample_len > n_ctx - self.k - 1:
            # the verify chunk needs K+1 free slots, so the engine's sequence
            # ceiling is K+1 below FusedEngine's — REFUSE rather than
            # silently emit fewer tokens than the fused-parity contract
            # (decoding._can_speculate pre-checks this on the product path)
            raise ValueError(
                f"initial ({n_initial}) + sample_len ({sample_len}) exceeds "
                f"{n_ctx} - K - 1 = {n_ctx - self.k - 1} slots; shorten "
                "sample_len or K, or use FusedEngine"
            )

        max_slots = n_initial + sample_len + self.k + 1
        last_window = next(w for w in (128, 256, n_ctx) if max_slots <= w)
        cfg = FusedConfig(
            n_group=1,
            n_audio=n_audio,
            beam_search=False,
            use_timestamps=use_timestamps,
            max_candidates=0,
            eot=eot,
            timestamp_begin=timestamp_begin,
            no_timestamps=no_timestamps,
            no_speech=no_speech,
            last_window=last_window,
            quantize_ckv=self._weights_mode == "int8",
        )
        fn = self._get(cfg)

        from . import profiling

        with profiling.timed("fused_decode_spec"):
            out = fn(
                self._decoder_params(),
                self._draft_decoder_params(),
                toks,
                self._scalar("int32", n_initial),
                ck,
                cv,
                draft_ck,
                draft_cv,
                self._scalar("int32", sot_index),
                suppress_mask,
                blank_mask,
                self._scalar(
                    "int32",
                    max_initial_ts_index if max_initial_ts_index is not None else n_ctx,
                ),
                self._scalar("int32", sample_len),
            )
            out = jax.device_get(out)
        *core, rounds, n_row = out
        # acceptance telemetry: each verify round lands exactly 1 target
        # token + m accepted draft tokens (EOT/limit truncation can shorten
        # both), and the prefill chooses one token before any round — so
        # accepted draft tokens ~= emitted - 1 - rounds, and the acceptance
        # rate a (the `1 + a*K` speedup knob) is that over rounds*K. This is
        # the number to watch when evaluating a distilled draft (distill.py).
        rounds = np.asarray(rounds)
        emitted = np.asarray(n_row) - n_initial
        accepted = np.maximum(emitted - 1 - rounds, 0)
        denom = np.maximum(rounds * self.k, 1)
        self.last_stats = {
            "rounds": rounds.tolist(),
            "emitted": emitted.tolist(),
            "draft_acceptance": (accepted / denom).tolist(),
            "k": self.k,
        }
        return tuple(core)
