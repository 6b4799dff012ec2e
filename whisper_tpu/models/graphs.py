"""Pure-functional Whisper compute graphs for XLA.

The reference factors inference into four separately compiled device graphs —
Encoder, CrossKV, Decoder256 (prefill), Decoder1 (step) — because that
factoring caps the number of distinct compiled shapes while keeping all
activations device-resident (/root/reference/coreml/coreml.mm:26-463). We keep
exactly that factoring, but as jitted JAX functions over static shapes:

  encode      mel (B, n_mels, 3000)            -> xa (B, 1500, d)
  cross_kv    xa                               -> cK/cV (L, B, H, dh, 1500)
  prefill     tokens (B, 256) + cross K/V      -> hidden, per-layer self K/V
  decode_step token (beam,) + KV cache         -> logits (beam, vocab), cache

TPU-first choices vs the reference:
  * layers are stacked and iterated with `lax.scan`, so compile time is
    depth-independent (the reference split its encoder into <=12-layer
    sub-models purely to appease ANECompilerService, encoder.py:114-136);
  * the 448-slot self-attention KV cache is a donated device array updated
    with `dynamic_update_slice`; beam reorder is a fused gather at the top of
    the step graph instead of the reference's native memcpy shuffle
    (coreml.mm:251-277);
  * prefill runs each unique sequence once — beams are broadcast afterwards —
    instead of the reference's sequential per-beam loop (decoder.py:216-234);
  * matmuls run in the params' dtype (bf16 in production) with f32
    accumulation/softmax; logits are always f32.

LayerNorm epsilons follow the reference: 1e-7 in the audio encoder
(encoder.py:66,95), 1e-5 (torch default) in the text decoder.
"""

import os

import jax
import jax.numpy as jnp

CACHE_SLOTS = 448  # n_text_ctx; fixed self-attention cache length
PREFILL_LEN = 256  # max first-pass token length (224 prompt + 3 sot + margin)


def _slot_write(cache, new_kv, pos, axis=3):
    """Write this step's new K/V row into slot `pos` (dim `axis`) of a cache.

    XLA lays the loop-carried cache out with the SLOT dim as the lane
    (minormost) dimension — the attention einsums want slots in lanes — so a
    dynamic_update_slice of one slot is a masked rewrite of every (8, 128)
    tile in the cache: profiled at 315 us/step on turbo beam-5 (13 MB at an
    effective 1.8 GB/s), the single most expensive op of the decode step. A
    dense one-hot select writes the same bytes but vectorizes cleanly in
    that layout. WHISPER_TPU_SLOT_WRITE=dus restores the old path for A/B.
    """
    if os.environ.get("WHISPER_TPU_SLOT_WRITE") == "dus":
        idx = [jnp.int32(0)] * cache.ndim
        idx[axis] = pos
        return jax.lax.dynamic_update_slice(cache, new_kv, tuple(idx))
    W = cache.shape[axis]
    shape = [1] * cache.ndim
    shape[axis] = W
    hit = (jnp.arange(W) == pos).reshape(shape)
    return jnp.where(hit, new_kv, cache)


def _dot(x, blk, name):
    """x @ blk[name], transparently handling weight-only int8 weights.

    A quantized weight (whisper_tpu/quant.py) is an int8 array with a sibling
    '<name>@scale' leaf holding one f32 scale per output channel. XLA:TPU
    fuses the s8->bf16 convert into the dot's weight read — no bf16 copy is
    materialized, so HBM weight traffic (what the bandwidth-bound decode step
    pays for) halves. Measured v5e, full turbo decoder weight sweep at beam
    batch: 1.61x over bf16; a Pallas dequant-in-VMEM kernel gained only ~5%
    more, so the pure-XLA form wins on simplicity.
    """
    w = blk[name]
    scale = blk.get(name + "@scale")
    if scale is None:
        return x @ w
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (y * scale).astype(x.dtype)


def _is_quant_pair(x):
    """An int8 cross-K/V operand is an (array, scale) pair whose scale has
    exactly one fewer axis (the dh axis reduced away). Distinguishes it from
    a tuple of per-layer entries, whose elements are same-rank arrays or
    pairs themselves."""
    return (
        isinstance(x, tuple)
        and len(x) == 2
        and not isinstance(x[0], tuple)
        and getattr(x[1], "ndim", -1) == getattr(x[0], "ndim", 0) - 1
    )


def _ckv_parts(ckv_l):
    """A per-layer cross-K/V operand is either a plain (B, H, dh, T) array
    or an int8 (array, (B, H, T) scale) pair from quant.quantize_cross_kv."""
    if _is_quant_pair(ckv_l):
        return ckv_l
    return ckv_l, None


def ckv_layer(ckv, l):
    """Index layer `l` of a cross-K/V operand: a stacked array, a stacked
    int8 (array, scale) pair, or an already-per-layer tuple of either."""
    if _is_quant_pair(ckv):
        return (ckv[0][l], ckv[1][l])
    return ckv[l]


def tok_embedding(dec, tokens, dtype):
    """Token-embedding rows, dequantizing per-row int8 if quantized."""
    emb = jnp.asarray(dec["tok_emb"])
    scale = dec.get("tok_emb@scale")
    rows = emb[tokens]
    if scale is None:
        return rows.astype(dtype)
    return (rows.astype(jnp.float32) * scale[tokens][..., None]).astype(dtype)


def layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _split_heads(x, n_head):
    # (..., T, d) -> (..., T, H, dh)
    return x.reshape(*x.shape[:-1], n_head, x.shape[-1] // n_head)


def _query_chunk(T: int) -> int:
    """Largest divisor of T that is <= 256 (0 disables chunking).

    Full-context self-attention materializes a (B, H, T, T) f32 score tensor
    in HBM twice (QK^T out, softmax out) — ~1.4 GB of traffic per turbo
    encoder layer at T=1500. Computing queries in ~250-row chunks keeps each
    chunk's scores inside one fusion: measured 1.15 -> 0.35 ms per encoder
    attention on v5e (bit-exact — every softmax row sees the full key set).
    The Pallas flash-attention kernel measured SLOWER here (2 ms; dh=64
    half-fills the MXU lanes), so the chunked-XLA form wins. Re-probed on
    live v5e with the splash-attention kernel family
    (jax.experimental.pallas.ops.tpu.splash_attention, full mask, T padded
    to 1536): 2.7x slower than this form at B=16 (31.8 vs 11.9 ms per
    whole-encoder-batch attention; jax.nn.dot_product_attention ties at
    11.4 ms) — same dh=64 lane under-fill, so the conclusion holds.
    """
    if T < 1024:
        return 0
    for blk in range(256, 63, -1):
        if T % blk == 0:
            return blk
    return 0


def _self_attention(q, k, v, mask, n_head):
    """q,k,v: (B, T, d); mask: broadcastable to (B, H, Tq, Tk) or None."""
    B, T, d = q.shape
    dh = d // n_head
    qh = _split_heads(q * (dh**-0.5), n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)

    blk = _query_chunk(T) if mask is None else 0
    if blk:
        qc = jnp.moveaxis(qh.reshape(B, T // blk, blk, n_head, dh), 1, 0)

        def one(qb):  # (B, blk, H, dh) against the full key set
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", qb, kh, preferred_element_type=jnp.float32
            )
            w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", w, vh)

        out = jnp.moveaxis(jax.lax.map(one, qc), 0, 1)
        return out.reshape(*q.shape)

    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(*q.shape)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode(enc, mel, *, n_head, unroll: int = 1):
    """mel: (B, n_mels, 3000) -> (B, 1500, d) audio features.

    `unroll` feeds lax.scan's unroll factor: the product path keeps 1
    (compile time scales with unrolled body size); tools/graph_bench.py
    lowers with unroll=n_layer so XLA's cost analysis counts every layer
    (it prices a rolled scan body once)."""
    dtype = enc["blocks"]["attn_q_w"].dtype
    x = mel.astype(dtype)

    dn = ("NCH", "OIH", "NCH")
    x = jax.lax.conv_general_dilated(
        x, enc["conv1_w"].astype(dtype), (1,), ((1, 1),), dimension_numbers=dn
    ) + enc["conv1_b"].astype(dtype)[None, :, None]
    x = _gelu(x)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2_w"].astype(dtype), (2,), ((1, 1),), dimension_numbers=dn
    ) + enc["conv2_b"].astype(dtype)[None, :, None]
    x = _gelu(x)

    x = jnp.transpose(x, (0, 2, 1))  # (B, 1500, d)
    x = x + enc["pos_emb"].astype(dtype)

    def block(x, blk):
        h = layer_norm(x, blk["attn_ln_g"], blk["attn_ln_b"], eps=1e-7)
        q = h @ blk["attn_q_w"] + blk["attn_q_b"]
        k = h @ blk["attn_k_w"]
        v = h @ blk["attn_v_w"] + blk["attn_v_b"]
        x = x + _self_attention(q, k, v, None, n_head) @ blk["attn_o_w"] + blk["attn_o_b"]

        h = layer_norm(x, blk["mlp_ln_g"], blk["mlp_ln_b"], eps=1e-7)
        h = _gelu(h @ blk["mlp_fc1_w"] + blk["mlp_fc1_b"])
        x = x + h @ blk["mlp_fc2_w"] + blk["mlp_fc2_b"]
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"], unroll=unroll)
    return layer_norm(x, enc["ln_post_g"], enc["ln_post_b"], eps=1e-7)


# ---------------------------------------------------------------------------
# Cross-attention K/V precompute (the reference's CrossKV graph,
# convert_ckv.py / decoder.py:172-187)
# ---------------------------------------------------------------------------


def cross_kv(dec, xa, *, n_head):
    """xa: (B, 1500, d) -> (cK, cV) each (L, B, H, dh, 1500).

    Time is the MINORMOST axis deliberately: with dh=64 minormost, every
    bf16 (8,128)-tiled buffer pads 64 lanes -> 128, doubling the memory AND
    the per-decode-step read traffic of the largest tensors in the model
    (measured: 2.0x padding expansion + XLA compress/uncompress copy pairs
    inside the decode loop). T=1500 pads to 1536 (2.4%)."""
    blocks = dec["blocks"]
    dtype = blocks["cross_k_w"].dtype
    xa = xa.astype(dtype)
    L = blocks["cross_k_w"].shape[0]
    B, T, d = xa.shape
    dh = d // n_head

    ck = jnp.einsum("btd,lde->lbte", xa, blocks["cross_k_w"])
    cv = jnp.einsum("btd,lde->lbte", xa, blocks["cross_v_w"]) + blocks["cross_v_b"][
        :, None, None, :
    ]
    ck = jnp.transpose(ck.reshape(L, B, T, n_head, dh), (0, 1, 3, 4, 2))
    cv = jnp.transpose(cv.reshape(L, B, T, n_head, dh), (0, 1, 3, 4, 2))
    return ck, cv


def _cross_attention(x, blk, ck_l, cv_l, n_head, return_scores=False):
    """x: (B, T, d); ck_l/cv_l: (Bx, H, dh, Tk) with Bx in {1, B} (broadcast),
    plain or int8 (array, scale) pairs (quant.quantize_cross_kv)."""
    ck_a, ck_s = _ckv_parts(ck_l)
    cv_a, cv_s = _ckv_parts(cv_l)
    h = layer_norm(x, blk["cross_ln_g"], blk["cross_ln_b"], eps=1e-5)
    q = _dot(h, blk, "cross_q_w") + blk["cross_q_b"]
    dh = q.shape[-1] // n_head
    qh = jnp.transpose(_split_heads(q * (dh**-0.5), n_head), (0, 2, 1, 3))
    scores = jnp.einsum(
        "bhqd,bhdk->bhqk", qh, ck_a.astype(qh.dtype) if ck_s is not None else ck_a,
        preferred_element_type=jnp.float32,
    )  # fmt: skip
    if ck_s is not None:
        # per-column K scale factors out of the dh contraction exactly
        scores = scores * ck_s[:, :, None, :]
    wf = jax.nn.softmax(scores, axis=-1)
    if cv_s is not None:
        # fold the per-column V scale into the softmax weights (exact)
        w = (wf * cv_s[:, :, None, :]).astype(x.dtype)
        out = jnp.einsum("bhqk,bhdk->bqhd", w, cv_a.astype(x.dtype))
    else:
        w = wf.astype(x.dtype)
        out = jnp.einsum("bhqk,bhdk->bqhd", w, cv_a)
    out = out.reshape(*x.shape)
    attn = _dot(out, blk, "cross_o_w") + blk["cross_o_b"]
    if return_scores:
        return attn, scores
    return attn, None


def _mlp(x, blk):
    h = layer_norm(x, blk["mlp_ln_g"], blk["mlp_ln_b"], eps=1e-5)
    h = _gelu(_dot(h, blk, "mlp_fc1_w") + blk["mlp_fc1_b"])
    return _dot(h, blk, "mlp_fc2_w") + blk["mlp_fc2_b"]


# ---------------------------------------------------------------------------
# Prefill (the reference's Decoder256 graph, decoder.py:207-240)
# ---------------------------------------------------------------------------


def prefill(dec, tokens, n_valid, ck, cv, *, n_head, unroll: int = 1):
    """First decoder pass over a padded token block.

    tokens: (B, PREFILL_LEN) int32, garbage beyond n_valid
    n_valid: scalar int32, number of real tokens
    ck/cv: (L, B or 1, H, dh, dh, 1500)

    Returns (hidden (B, P, d) final-LN'd, kv (L, 2, B, P, d)).
    Key positions >= n_valid are masked for every query, mirroring the
    reference qk_mask[:, n_ctx:] = -inf; query rows >= n_valid produce
    garbage that callers must not read.
    """
    blocks = dec["blocks"]
    dtype = blocks["attn_q_b"].dtype  # a bias: cast to compute dtype, never quantized
    B, P = tokens.shape

    x = tok_embedding(dec, tokens, dtype) + dec["pos_emb"][:P].astype(dtype)

    causal = jnp.triu(jnp.full((P, P), -jnp.inf, dtype=jnp.float32), k=1)
    invalid = jnp.where(jnp.arange(P)[None, :] >= n_valid, -jnp.inf, 0.0)
    mask = (causal + invalid)[None, None]  # (1, 1, P, P)

    def block(x, inputs):
        blk, ck_l, cv_l = inputs
        h = layer_norm(x, blk["attn_ln_g"], blk["attn_ln_b"], eps=1e-5)
        q = _dot(h, blk, "attn_q_w") + blk["attn_q_b"]
        k = _dot(h, blk, "attn_k_w")
        v = _dot(h, blk, "attn_v_w") + blk["attn_v_b"]
        x = x + _dot(_self_attention(q, k, v, mask, n_head), blk, "attn_o_w") + blk["attn_o_b"]

        attn, _ = _cross_attention(x, blk, ck_l, cv_l, n_head)
        x = x + attn
        x = x + _mlp(x, blk)
        return x, jnp.stack([k, v])  # (2, B, P, d)

    x, kv = jax.lax.scan(block, x, (blocks, ck, cv), unroll=unroll)
    x = layer_norm(x, dec["ln_g"], dec["ln_b"], eps=1e-5)
    return x, kv


def prefill_with_alignment(dec, tokens, n_valid, ck, cv, *, n_head, alignment_heads):
    """Prefill variant that also returns cross-attention score rows for the
    given static (layer, head) pairs — the reference Decoder256's
    out_cross_head_weights output used for DTW word timing
    (decoder.py:306-313). Layers are unrolled so only the selected heads are
    materialized.

    Returns (hidden, kv, align_scores (n_selected, P, 1500) float32).
    """
    blocks = dec["blocks"]
    dtype = blocks["attn_q_b"].dtype  # a bias: cast to compute dtype, never quantized
    B, P = tokens.shape
    L = blocks["attn_q_w"].shape[0]
    assert B == 1, "alignment replay runs at batch size 1"

    x = tok_embedding(dec, tokens, dtype) + dec["pos_emb"][:P].astype(dtype)

    causal = jnp.triu(jnp.full((P, P), -jnp.inf, dtype=jnp.float32), k=1)
    invalid = jnp.where(jnp.arange(P)[None, :] >= n_valid, -jnp.inf, 0.0)
    mask = (causal + invalid)[None, None]

    wanted = {}
    for i, (layer, head) in enumerate(alignment_heads):
        wanted.setdefault(int(layer), []).append((int(head), i))

    align = [None] * len(alignment_heads)
    kv = []
    for l in range(L):
        blk = jax.tree.map(lambda a: a[l], blocks)
        h = layer_norm(x, blk["attn_ln_g"], blk["attn_ln_b"], eps=1e-5)
        q = _dot(h, blk, "attn_q_w") + blk["attn_q_b"]
        k = _dot(h, blk, "attn_k_w")
        v = _dot(h, blk, "attn_v_w") + blk["attn_v_b"]
        x = x + _dot(_self_attention(q, k, v, mask, n_head), blk, "attn_o_w") + blk["attn_o_b"]

        need = l in wanted
        attn, scores = _cross_attention(
            x, blk, ckv_layer(ck, l), ckv_layer(cv, l), n_head, return_scores=need
        )
        if need:
            for head, i in wanted[l]:
                align[i] = scores[0, head]  # (P, 1500) f32
        x = x + attn
        x = x + _mlp(x, blk)
        kv.append(jnp.stack([k, v]))

    x = layer_norm(x, dec["ln_g"], dec["ln_b"], eps=1e-5)
    return x, jnp.stack(kv), jnp.stack(align)


def _alignment_cost_matrix(align, n_valid, n_frames_half, qk_scale, medfilt_width):
    """Process raw alignment-head cross-attention scores into the DTW cost
    matrix ON DEVICE — the softmax / z-norm / median-filter / head-mean chain
    the reference runs on host tensors (/root/reference/whisper/timing.py:
    196-205). Only the small (tokens, frames) matrix then crosses the host
    boundary instead of the full (heads, tokens, frames) block (~24 MB per
    window over remote PJRT at 40 heads).

    align: (Hn, P, F) f32 raw scores; n_valid: traced token count;
    n_frames_half: traced valid frame count (num_frames // 2). Frame columns
    >= n_frames_half and token rows >= n_valid are excluded exactly as the
    host path's up-front slicing excludes them; the median filter reflects at
    the n_frames_half boundary like np.pad(mode="reflect") does at the edge
    of the sliced array. Rows >= n_valid of the result are garbage; columns
    >= n_frames_half are junk reads the caller must slice off.
    """
    Hn, P, F = align.shape
    frames = jnp.arange(F)
    fmask = frames < n_frames_half  # (F,)

    w = align.astype(jnp.float32) * qk_scale
    w = jnp.where(fmask[None, None, :], w, -jnp.inf)
    w = jax.nn.softmax(w, axis=-1)  # invalid frames -> exactly 0

    # z-normalize per head over the n_valid token rows (population std)
    rmask = (jnp.arange(P) < n_valid)[None, :, None]
    n = n_valid.astype(jnp.float32)
    mean = jnp.sum(jnp.where(rmask, w, 0.0), axis=1, keepdims=True) / n
    var = jnp.sum(jnp.where(rmask, (w - mean) ** 2, 0.0), axis=1, keepdims=True) / n
    w = (w - mean) / jnp.sqrt(var)

    # median filter along frames, reflecting at the dynamic n_frames_half
    # boundary (the host filters the already-sliced array, so its reflect
    # edge IS that boundary). Requires n_frames_half > medfilt_width // 2,
    # which transcribe()'s sub-second-tail discard guarantees.
    pad = medfilt_width // 2
    shifted = []
    for off in range(-pad, pad + 1):
        idx = frames + off
        idx = jnp.where(idx < 0, -idx, idx)
        idx = jnp.where(idx >= n_frames_half, 2 * n_frames_half - 2 - idx, idx)
        idx = jnp.clip(idx, 0, F - 1)
        shifted.append(jnp.take(w, idx, axis=-1))
    w = jnp.sort(jnp.stack(shifted, axis=-1), axis=-1)[..., pad]

    return jnp.mean(w, axis=0)  # (P, F)


def alignment_outputs(
    dec,
    tokens,
    n_valid,
    ck,
    cv,
    row_ids,
    n_frames_half,
    qk_scale,
    *,
    n_head,
    alignment_heads,
    eot,
    medfilt_width=7,
):
    """The whole word-timestamp replay as ONE device program: teacher-forced
    prefill with alignment-head score capture, per-token text probabilities,
    and the processed DTW cost matrix. One execute RPC per window; only a
    (P,) probability vector and the (tokens, frames) matrix leave the device
    (the reference fetches full logits AND raw per-head weights,
    timing.py:191-205).

    row_ids: (P,) int32 — row_ids[i] is the token whose probability row i
    reports (0 outside the sampled text range). Returns
    (text_probs (P,) f32, matrix (P, F) f32).
    """
    hidden, _, align = prefill_with_alignment(
        dec, tokens, n_valid, ck, cv, n_head=n_head, alignment_heads=alignment_heads
    )
    logits = hidden_to_logits(dec, hidden[0])[:, :eot]
    probs = jax.nn.softmax(logits, axis=-1)
    text_probs = probs[jnp.arange(probs.shape[0]), row_ids]
    matrix = _alignment_cost_matrix(
        align, n_valid, n_frames_half, qk_scale, medfilt_width
    )
    return text_probs, matrix


def decoder_forward(dec, tokens, ck, cv, *, n_head):
    """Teacher-forced decoder pass over full sequences (no KV cache) — the
    training/fine-tuning forward. tokens: (B, T) int32; ck/cv: (L, B or 1, H, dh,
    Tk, dh). Returns logits (B, T, V) float32."""
    blocks = dec["blocks"]
    dtype = blocks["attn_q_b"].dtype  # a bias: cast to compute dtype, never quantized
    B, T = tokens.shape

    x = tok_embedding(dec, tokens, dtype) + dec["pos_emb"][:T].astype(dtype)
    mask = jnp.triu(jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1)[None, None]

    def block(x, inputs):
        blk, ck_l, cv_l = inputs
        h = layer_norm(x, blk["attn_ln_g"], blk["attn_ln_b"], eps=1e-5)
        q = _dot(h, blk, "attn_q_w") + blk["attn_q_b"]
        k = _dot(h, blk, "attn_k_w")
        v = _dot(h, blk, "attn_v_w") + blk["attn_v_b"]
        x = x + _dot(_self_attention(q, k, v, mask, n_head), blk, "attn_o_w") + blk["attn_o_b"]
        attn, _ = _cross_attention(x, blk, ck_l, cv_l, n_head)
        x = x + attn
        x = x + _mlp(x, blk)
        return x, None

    x, _ = jax.lax.scan(block, x, (blocks, ck, cv))
    x = layer_norm(x, dec["ln_g"], dec["ln_b"], eps=1e-5)
    return hidden_to_logits(dec, x)


def hidden_to_logits(dec, hidden):
    """hidden (..., d) -> logits (..., n_vocab) in float32.

    With a weight-only int8 embedding (quant.py) the (V, d) read — the
    single largest weight tensor of the decode step (133 MB bf16 for turbo)
    — halves; the per-vocab-row scale multiplies the f32 logits."""
    scale = dec.get("tok_emb@scale")
    if scale is None:
        return jnp.einsum(
            "...d,vd->...v", hidden, dec["tok_emb"], preferred_element_type=jnp.float32
        )
    logits = jnp.einsum(
        "...d,vd->...v",
        hidden.astype(jnp.bfloat16),
        dec["tok_emb"].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return logits * scale


# ---------------------------------------------------------------------------
# Single-token autoregressive step (the reference's Decoder1 graph,
# decoder.py:241-259 + the native KV scatter, coreml.mm:404-444)
# ---------------------------------------------------------------------------


def decode_step(
    dec,
    tokens,
    pos,
    cache,
    src,
    ck,
    cv,
    *,
    n_head,
    reorder=True,
    window=None,
    row_map=None,
):
    """One autoregressive decoder step for all beams.

    tokens: (B,) int32 — tokens sampled at the previous step, B = n_audio*group
    pos:    scalar int32 — cache slot to write (== number of tokens so far)
    cache:  (L, 2, B, CACHE_SLOTS, d) — donated self-attention K/V cache
    src:    (B,) int32 — beam reorder indices from the previous beam-search
            update, fused into this graph as a gather (identity for greedy)
    ck/cv:  (L, Bc, H, dh, 1500) with B % Bc == 0 — the cross K/V is stored
            once per AUDIO and shared by that audio's beam group (audio-major
            batch layout), never replicated per beam: the reference instead
            keeps one arrayCK/CV per decode at fixed beam batch
            (coreml.mm:122-169)

    window: static number of leading cache slots this step may touch
            (requires pos < window). The fused loop runs in bucketed phases
            (128/256/448) so attention reads, the beam-reorder gather and the
            write-back all scale with actual occupancy instead of the full
            448 slots — profiled at 2.6x on large-v3 batch-40 decode, and a
            lax.switch alternative paid whole-cache copies at the cond
            boundary.

    Returns (logits (B, n_vocab) f32, new cache).
    """
    blocks = dec["blocks"]
    # blocks/ck/cv may arrive PRE-SLICED per layer (tuples built once outside
    # the decode while-loop): even with the layer loop fully unrolled, XLA
    # kept per-step kLoop fusions re-materializing each layer's weight and
    # cross-K/V slices inside the loop body (~76 us/step of pure copy on
    # turbo beam-5, HLO-verified) — slicing outside the loop hoists them.
    presliced = isinstance(blocks, (list, tuple))
    dtype = (blocks[0] if presliced else blocks)["attn_q_b"].dtype  # bias: never quantized
    beam = tokens.shape[0]
    d = dec["tok_emb"].shape[1]
    dh = d // n_head
    # the cache may also be a PER-LAYER tuple of (2, B, C, d) arrays (the
    # fused engine's carry for unrolled decoders): indexing a stacked
    # loop-carried (L, ...) cache per layer materialized a 13 MB copy chain
    # per step (55 us on turbo beam-5) that per-layer carries avoid
    tuple_cache = isinstance(cache, (list, tuple))
    if tuple_cache:
        L, C = len(cache), cache[0].shape[2]
    else:
        L, _, _, C, _ = cache.shape
    W = C if window is None else window

    full_cache = cache
    if W != C:
        # static prefix slab
        if tuple_cache:
            cache = tuple(
                jax.lax.slice(c, (0, 0, 0, 0), (2, beam, W, d)) for c in cache
            )
        else:
            cache = jax.lax.slice(cache, (0, 0, 0, 0, 0), (L, 2, beam, W, d))

    # row_map (B, W): lazy beam reorder — cache rows never move; each logical
    # beam's history is gathered at the attention read via per-position row
    # indices maintained by the fused engine. Avoids materializing a permuted
    # cache every step (the gather + carry-update chain measured ~7.6 ms/step
    # at large-v3 batch 40; the read-time gather probe was 38% cheaper).
    if row_map is None and reorder:
        # eager reorder (host loop / compatibility): greedy never permutes
        if tuple_cache:
            cache = tuple(jnp.take(c, src, axis=1) for c in cache)
        else:
            cache = jnp.take(cache, src, axis=2)

    x = tok_embedding(dec, tokens, dtype)[:, None, :]  # (beam, 1, d)
    x = x + jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1, axis=0).astype(dtype)

    # cached slots strictly before `pos` are valid; the fresh token's K/V is
    # appended as a 449th score column instead of being written into the
    # cache pre-attention. The cache layers flow through the scan as
    # READ-ONLY xs and all L new slots are written afterwards in ONE tiny
    # dynamic_update_slice — profiling showed the previous
    # write-then-stack structure rewrote the full 91 MB layer per layer
    # (plus a whole-cache copy per loop iteration): ~45 of 52 ms/step at
    # batch 40 was cache plumbing, not math.
    kmask = jnp.where(
        jnp.arange(W)[None, None, :] < pos, 0.0, -jnp.inf
    )  # (1, 1, W)

    def block(x, inputs):
        blk, cache_l, ck_l, cv_l = inputs
        ck_a, ck_s = _ckv_parts(ck_l)  # int8 cross-K/V rides as (arr, scale)
        cv_a, cv_s = _ckv_parts(cv_l)
        h = layer_norm(x, blk["attn_ln_g"], blk["attn_ln_b"], eps=1e-5)
        q = (_dot(h, blk, "attn_q_w") + blk["attn_q_b"])[:, 0]  # (beam, d)
        k = _dot(h, blk, "attn_k_w")[:, 0]
        v = (_dot(h, blk, "attn_v_w") + blk["attn_v_b"])[:, 0]

        qh = _split_heads(q * (dh**-0.5), n_head)  # (beam, H, dh)
        k_cache, v_cache = cache_l[0], cache_l[1]  # (beam, W, d)
        kh_new = _split_heads(k, n_head)  # (beam, H, dh)
        vh_new = _split_heads(v, n_head)
        if row_map is not None and ck_a.shape[0] > 1 and not tuple_cache:
            # Multi-audio batch: row_map is block-diagonal per audio (a beam
            # only ever reorders within its own audio's group), so scoring
            # each query against all B source rows wastes an A-fold factor of
            # the one-hot blowup below. Regroup the READ path (a free reshape
            # of the leading dim — no data movement) and contract within the
            # G-row audio blocks. Gated to the multi-audio stacked path: on the
            # tuple-cache path the (A, G) regrouping of the cache views broke
            # XLA's in-place cache update (24 -> 318 us DUS), but here the
            # slab is already a materialized copy and the slot write targets
            # the full cache separately. Bit-identical to the dense form:
            # the dropped terms are exact 0.0 products.
            A_, Gq = ck_a.shape[0], beam // ck_a.shape[0]
            qh_g = qh.reshape(A_, Gq, n_head, dh)
            kh_g = _split_heads(k_cache, n_head).reshape(A_, Gq, W, n_head, dh)
            vh_g = _split_heads(v_cache, n_head).reshape(A_, Gq, W, n_head, dh)
            row_local = row_map.reshape(A_, Gq, W) - (
                jnp.arange(A_, dtype=row_map.dtype) * Gq
            )[:, None, None]
            onehot = (
                row_local[:, :, None, :]
                == jnp.arange(Gq, dtype=row_map.dtype)[None, None, :, None]
            )  # (A, G_query, G_source, W) bool
            s_all = jnp.einsum(
                "aghd,acwhd->aghcw", qh_g, kh_g, preferred_element_type=jnp.float32
            )  # (A, G, H, G_src, W)
            scores = (
                jnp.einsum("aghcw,agcw->aghw", s_all, onehot.astype(jnp.float32))
                + kmask[None]
            )
            score_new = jnp.einsum(
                "bhd,bhd->bh", qh, kh_new, preferred_element_type=jnp.float32
            ).reshape(A_, Gq, n_head)
            full = jnp.concatenate([scores, score_new[..., None]], axis=3)
            w = jax.nn.softmax(full, axis=-1).astype(dtype)  # (A, G, H, W+1)
            p2 = jnp.einsum("aghw,agcw->aghcw", w[..., :-1], onehot.astype(dtype))
            wv = jnp.einsum("aghcw,acwhd->aghd", p2, vh_g).reshape(beam, n_head, dh)
            wv = (wv + w[..., -1].reshape(beam, n_head)[..., None] * vh_new).reshape(
                beam, 1, d
            )
        elif row_map is not None:
            # Lazy beam reorder WITHOUT a gather: score each query beam
            # against ALL B source rows — a B-fold blowup of a tiny MXU
            # contraction — and collapse with the one-hot row mask derived
            # from row_map. The cache is read ONCE at full rows; the former
            # jnp.take_along_axis materialized a permuted copy (read + write
            # + re-read = 3x the HBM traffic) and its gather ran ~6x off
            # bandwidth roofline (profiled at 190 us of a 1.0 ms turbo
            # beam-5 step; TPUs hate gathers, MXUs eat einsums). The cache
            # views keep their original (beam, W, H, dh) shapes so XLA's
            # in-place analysis still updates the loop-carried cache with a
            # true in-place dynamic_update_slice (an (A, G, ...) regrouped
            # variant compiled to a whole-cache copy per step: 24 -> 318 us).
            onehot = (
                row_map[:, None, :]
                == jnp.arange(beam, dtype=row_map.dtype)[None, :, None]
            )  # (B_query, B_source, W) bool — block-diagonal per audio
            kh = _split_heads(k_cache, n_head)  # (src, W, H, dh)
            vh = _split_heads(v_cache, n_head)
            s_all = jnp.einsum(
                "bhd,cwhd->bhcw", qh, kh, preferred_element_type=jnp.float32
            )  # (B, H, B_src, W)
            scores = (
                jnp.einsum("bhcw,bcw->bhw", s_all, onehot.astype(jnp.float32))
                + kmask
            )
            score_new = jnp.einsum(
                "bhd,bhd->bh", qh, kh_new, preferred_element_type=jnp.float32
            )
            full = jnp.concatenate([scores, score_new[:, :, None]], axis=2)
            w = jax.nn.softmax(full, axis=-1).astype(dtype)  # (beam, H, W+1)
            p2 = jnp.einsum(
                "bhw,bcw->bhcw", w[:, :, :-1], onehot.astype(dtype)
            )
            wv = jnp.einsum("bhcw,cwhd->bhd", p2, vh)
            wv = (wv + w[:, :, -1, None] * vh_new).reshape(beam, 1, d)
        else:
            kh = _split_heads(k_cache, n_head)  # (beam, W, H, dh)
            vh = _split_heads(v_cache, n_head)
            scores = (
                jnp.einsum(
                    "bhd,bkhd->bhk", qh, kh, preferred_element_type=jnp.float32
                )
                + kmask
            )
            score_new = jnp.einsum(
                "bhd,bhd->bh", qh, kh_new, preferred_element_type=jnp.float32
            )
            full = jnp.concatenate([scores, score_new[:, :, None]], axis=2)
            w = jax.nn.softmax(full, axis=-1).astype(dtype)  # (beam, H, C+1)
            wv = jnp.einsum("bhk,bkhd->bhd", w[:, :, :-1], vh)
            wv = (wv + w[:, :, -1, None] * vh_new).reshape(beam, 1, d)
        x = x + _dot(wv, blk, "attn_o_w") + blk["attn_o_b"]

        # cross attention grouped by audio: ck_l/cv_l are (Bc, H, dh, T) with
        # group = beam // Bc query rows sharing each audio's K/V
        hc = layer_norm(x, blk["cross_ln_g"], blk["cross_ln_b"], eps=1e-5)
        qc = (_dot(hc, blk, "cross_q_w") + blk["cross_q_b"])[:, 0]  # (beam, d)
        Bc = ck_a.shape[0]
        group = beam // Bc
        qc = (qc * (dh**-0.5)).reshape(Bc, group, n_head, dh)
        cscores = jnp.einsum(
            "bghd,bhdk->bghk",
            qc,
            ck_a.astype(qc.dtype) if ck_s is not None else ck_a,
            preferred_element_type=jnp.float32,
        )
        if ck_s is not None:
            # per-column K scale factors out of the dh contraction exactly
            cscores = cscores * ck_s[:, None, :, :]
        cwf = jax.nn.softmax(cscores, axis=-1)
        if cv_s is not None:
            # fold the per-column V scale into the softmax weights (exact)
            cw = (cwf * cv_s[:, None, :, :]).astype(dtype)
            cwv = jnp.einsum(
                "bghk,bhdk->bghd", cw, cv_a.astype(dtype)
            ).reshape(beam, 1, d)
        else:
            cw = cwf.astype(dtype)
            cwv = jnp.einsum("bghk,bhdk->bghd", cw, cv_a).reshape(beam, 1, d)
        x = x + _dot(cwv, blk, "cross_o_w") + blk["cross_o_b"]

        x = x + _mlp(x, blk)
        return x, jnp.stack([k, v])  # (2, beam, d) — this layer's new slot

    # shallow decoders (turbo: 4 layers) unroll as a PYTHON loop, not
    # lax.scan(unroll=True): even fully unrolled, scan's per-layer xs slices
    # survived as kLoop fusions INSIDE the decode while-loop — every step
    # re-sliced and re-materialized each layer's (d, d)/(d, 4d) weight
    # matrices (~68 us/step of pure copy on turbo beam-5, HLO-verified).
    # Static tree indexing gives XLA loop-invariant weight operands it feeds
    # to the matmuls directly.
    if presliced or tuple_cache or L <= 8:
        new_slots = []
        for l in range(L):
            blk_l = blocks[l] if presliced else jax.tree.map(lambda a: a[l], blocks)
            x, kv_l = block(x, (blk_l, cache[l], ckv_layer(ck, l), ckv_layer(cv, l)))
            new_slots.append(kv_l)  # each (2, beam, d)
        new_kv = None if tuple_cache else jnp.stack(new_slots)
    else:
        x, new_kv = jax.lax.scan(block, x, (blocks, cache, ck, cv))

    if tuple_cache:
        # per-layer writes into the per-layer carried caches (no re-stack)
        slots = [kv_l[:, :, None, :] for kv_l in new_slots]  # (2, beam, 1, d)
        if row_map is not None or (W != C and not reorder):
            cache = tuple(
                _slot_write(full_cache[l], slots[l], pos, axis=2) for l in range(L)
            )
        elif W != C:  # reordered slab write-back
            cache = tuple(
                jax.lax.dynamic_update_slice(
                    full_cache[l],
                    _slot_write(cache[l], slots[l], pos, axis=2),
                    (0, 0, 0, 0),
                )
                for l in range(L)
            )
        else:
            cache = tuple(
                _slot_write(cache[l], slots[l], pos, axis=2) for l in range(L)
            )
    else:
        new_kv = new_kv[:, :, :, None, :]  # (L, 2, B, 1, d)
        if row_map is not None:
            # lazy reorder: rows never move — only the new slot lands in cache
            cache = _slot_write(full_cache, new_kv, pos)
        elif W != C and reorder:
            # write the reordered slab (incl. new slot) back into the full cache
            cache = _slot_write(cache, new_kv, pos)
            cache = jax.lax.dynamic_update_slice(
                full_cache, cache, (0, 0, 0, 0, 0)
            )
        elif W != C:
            # greedy: slab untouched — only the new slot lands in the full cache
            cache = _slot_write(full_cache, new_kv, pos)
        else:
            cache = _slot_write(cache, new_kv, pos)
    x = layer_norm(x, dec["ln_g"], dec["ln_b"], eps=1e-5)
    logits = hidden_to_logits(dec, x[:, 0])
    return logits, cache


def make_empty_cache(n_layer, beam, d, dtype):
    return jnp.zeros((n_layer, 2, beam, CACHE_SLOTS, d), dtype=dtype)


def kv_to_cache(kv, beam, dtype):
    """Broadcast prefill K/V (L, 2, 1, P, d) into a fresh (L, 2, beam,
    CACHE_SLOTS, d) cache. Replaces the reference's per-beam Decoder256 runs
    writing into beam slots of arrayMKV448 (coreml.mm:279-327)."""
    L, two, B, P, d = kv.shape
    cache = jnp.zeros((L, 2, beam, CACHE_SLOTS, d), dtype=dtype)
    kv_b = jnp.broadcast_to(kv.astype(dtype), (L, 2, beam, P, d))
    return jax.lax.dynamic_update_slice(cache, kv_b, (0, 0, 0, 0, 0))


# ---------------------------------------------------------------------------
# K-token mid-sequence decoder pass (speculative decoding verify/draft step).
# No reference analog: the reference decodes strictly one token per Decoder1
# run (decoder.py:241-259); verifying K drafted tokens in one pass is the
# TPU-serving extension — the decoder weight sweep that makes the
# autoregressive step bandwidth-bound is paid ONCE for K+1 positions.
# ---------------------------------------------------------------------------


def decode_chunk(dec, tokens_k, pos, cache, ck, cv, *, n_head, active=None):
    """Decode K tokens at per-row positions in one pass.

    tokens_k: (B, K) i32 — tokens occupying positions pos[b] .. pos[b]+K-1
    pos:      (B,) i32 — first cache slot this chunk writes (== tokens fed
              so far for row b); rows may differ (speculative acceptance
              diverges per audio)
    cache:    (L, 2, B, C, d) self-attention K/V, valid for slots < pos[b]
    ck/cv:    (L, Bc, H, dh, T) cross K/V (plain or int8 pairs), Bc in {1, B}
    active:   (B,) bool or None — rows with active=False write NOTHING into
              the cache (their logits are still computed and must be ignored
              by the caller); used to freeze finished rows in lockstep loops.

    Returns (logits (B, K, V) f32 for positions pos+1 .. pos+K, new cache).
    Greedy/speculative only: no beam row_map support.

    Like decode_step, `blocks`/`ck`/`cv` may arrive PRE-SLICED as per-layer
    tuples and `cache` as a per-layer tuple of (2, B, C, d) arrays: inside
    the speculative while-loops, scan's per-layer xs slices re-materialize
    every iteration (the same ~76 us/step copy chain HLO-profiled on the
    fused loop), so the spec engine hoists the slicing outside the loop.
    """
    blocks = dec["blocks"]
    presliced = isinstance(blocks, (list, tuple))
    dtype = (blocks[0] if presliced else blocks)["attn_q_b"].dtype
    B, K = tokens_k.shape
    d = dec["tok_emb"].shape[1]
    tuple_cache = isinstance(cache, (list, tuple))
    if tuple_cache:
        L, C = len(cache), cache[0].shape[2]
    else:
        L, _, _, C, _ = cache.shape
    dh = d // n_head
    pos = pos.astype(jnp.int32)

    pidx = jnp.clip(pos[:, None] + jnp.arange(K)[None, :], 0, C - 1)  # (B, K)
    x = tok_embedding(dec, tokens_k, dtype) + dec["pos_emb"][pidx].astype(dtype)

    # cached slots strictly before pos[b] are valid for every query row of b
    kmask = jnp.where(
        jnp.arange(C)[None, None, None, :] < pos[:, None, None, None], 0.0, -jnp.inf
    )  # (B, 1, 1, C)
    # intra-chunk causality: query i sees chunk keys j <= i
    causal = jnp.where(
        jnp.arange(K)[:, None] >= jnp.arange(K)[None, :], 0.0, -jnp.inf
    )[None, None]  # (1, 1, K, K)

    def block(x, inputs):
        blk, cache_l, ck_l, cv_l = inputs
        h = layer_norm(x, blk["attn_ln_g"], blk["attn_ln_b"], eps=1e-5)
        q = _dot(h, blk, "attn_q_w") + blk["attn_q_b"]  # (B, K, d)
        k = _dot(h, blk, "attn_k_w")
        v = _dot(h, blk, "attn_v_w") + blk["attn_v_b"]

        qh = _split_heads(q * (dh**-0.5), n_head)  # (B, K, H, dh)
        kh_new = _split_heads(k, n_head)
        vh_new = _split_heads(v, n_head)
        kh_c = _split_heads(cache_l[0], n_head)  # (B, C, H, dh)
        vh_c = _split_heads(cache_l[1], n_head)

        s_cache = (
            jnp.einsum("bqhd,bchd->bhqc", qh, kh_c, preferred_element_type=jnp.float32)
            + kmask
        )  # (B, H, K, C)
        s_chunk = (
            jnp.einsum("bqhd,bkhd->bhqk", qh, kh_new, preferred_element_type=jnp.float32)
            + causal
        )  # (B, H, K, K)
        w = jax.nn.softmax(jnp.concatenate([s_cache, s_chunk], axis=-1), axis=-1)
        w = w.astype(dtype)
        wv = jnp.einsum("bhqc,bchd->bqhd", w[..., :C], vh_c) + jnp.einsum(
            "bhqk,bkhd->bqhd", w[..., C:], vh_new
        )
        x = x + _dot(wv.reshape(B, K, d), blk, "attn_o_w") + blk["attn_o_b"]

        attn, _ = _cross_attention(x, blk, ck_l, cv_l, n_head)
        x = x + attn
        x = x + _mlp(x, blk)
        return x, jnp.stack([k, v])  # (2, B, K, d)

    if presliced or tuple_cache or L <= 8:
        # unrolled Python loop over layers: loop-invariant weight operands
        # (see the decode_step comment — scan xs slices survive as kLoop
        # fusions inside an enclosing while body)
        new_slots = []
        for l in range(L):
            blk_l = blocks[l] if presliced else jax.tree.map(lambda a: a[l], blocks)
            x, kv_l = block(
                x, (blk_l, cache[l], ckv_layer(ck, l), ckv_layer(cv, l))
            )
            new_slots.append(kv_l)  # each (2, B, K, d)
        new_kv = None if tuple_cache else jnp.stack(new_slots)
    else:
        x, new_kv = jax.lax.scan(block, x, (blocks, cache, ck, cv))  # (L,2,B,K,d)

    # scatter the chunk's K/V into per-row slots [pos_b, pos_b+K) with a
    # one-hot einsum (a per-row dynamic_update_slice is a serialized masked
    # rewrite on TPU; the dense select writes the same bytes vectorized)
    onehot = (jnp.arange(C)[None, None, :] == pidx[:, :, None]).astype(dtype)  # (B,K,C)
    if active is not None:
        onehot = onehot * active[:, None, None].astype(dtype)
    hit = jnp.sum(onehot, axis=1) > 0  # (B, C)
    if tuple_cache:
        cdt = cache[0].dtype
        oh = onehot.astype(cdt)
        cache = tuple(
            jnp.where(
                hit[None, :, :, None],
                jnp.einsum("sbkd,bkc->sbcd", new_slots[l].astype(cdt), oh),
                cache[l],
            )
            for l in range(L)
        )
    else:
        placed = jnp.einsum(
            "lsbkd,bkc->lsbcd", new_kv.astype(cache.dtype), onehot.astype(cache.dtype)
        )
        cache = jnp.where(hit[None, None, :, :, None], placed, cache)

    x = layer_norm(x, dec["ln_g"], dec["ln_b"], eps=1e-5)
    return hidden_to_logits(dec, x), cache
