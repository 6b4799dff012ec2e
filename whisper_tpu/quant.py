"""Weight-only int8 quantization for the text decoder.

The autoregressive decode step is HBM-bandwidth-bound on WEIGHT reads: every
step streams the full decoder weight set plus the (n_vocab, d) embedding used
as the logits head (~317 MB in bf16 for turbo) past a few KB of activations.
Storing those weights as int8 with one float scale per output channel halves
the bytes; XLA:TPU fuses the s8->bf16 convert into the dot's HBM read without
materializing a bf16 copy (measured on v5e: the full turbo decoder weight
sweep at beam-size batch runs 1.61x faster as int8+inline-cast, and a Pallas
kernel doing the same dequant-in-VMEM adds only ~5% more — so this is a
pure-XLA path, no custom kernel).

This is an OPT-IN serving optimization (WHISPER_TPU_WEIGHTS=int8 or
FusedEngine(weights="int8")): symmetric per-channel weight-only quantization
is the standard near-lossless recipe (whisper.cpp's q8_0, faster-whisper's
int8 mode), but token-level parity with the bf16 engine is NOT guaranteed —
argmax ties can flip — so the fidelity/parity paths keep bf16 weights.

Quantized tensors ride in the same pytree: each weight key gains a sibling
'<name>@scale' leaf and the graphs' matmul helper (graphs._dot) dequantizes
transparently. Activations, biases, layer norms, positional embeddings and
the cross-K/V projection weights (compute-bound, run once per window inside
the frontend program) stay bf16.

Reference analog: none — the reference runs fp16 ANE weights
(/root/reference/convert_encoder.py:50-55 compute_precision=FLOAT16); int8
weight-only is the TPU-serving extension of the same "shrink the weight
bytes" idea.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# the decode-step / prefill weight matmuls (K-major: (..., K, N), contracted
# over K = axis -2, so scales are per output channel N)
DECODER_QUANT_KEYS: Tuple[str, ...] = (
    "attn_q_w",
    "attn_k_w",
    "attn_v_w",
    "attn_o_w",
    "cross_q_w",
    "cross_o_w",
    "mlp_fc1_w",
    "mlp_fc2_w",
)


@jax.jit
def _quantize_k_major(w):
    """(..., K, N) weight -> (int8 weight, (..., N) f32 scale)."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0 + 1e-12
    wi8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return wi8, s.squeeze(-2)


@jax.jit
def _quantize_rows(w):
    """(V, d) embedding -> (int8, (V,) f32 scale); the logits head contracts
    over d (axis -1), so scales are per vocab row."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-1, keepdims=True) / 127.0 + 1e-12
    wi8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return wi8, s.squeeze(-1)


def quantize_cross_kv_math(ck, cv):
    """Traceable body of quantize_cross_kv — called INSIDE the fused decode
    program (engine_fused.fused_decode) so the quantization pass adds no
    extra program execution: dispatching it as its own program measured
    ~10 ms/run of tunnel/dispatch overhead that ate the entire read saving,
    while inline it costs one ~115 us pass over the cross-K/V per window."""

    def q(x):
        xf = x.astype(jnp.float32)
        s = jnp.max(jnp.abs(xf), axis=3, keepdims=True) / 127.0 + 1e-12
        xi8 = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return xi8, s.squeeze(3)

    return q(ck), q(cv)


@jax.jit
def quantize_cross_kv(ck, cv):
    """Per-column int8 quantization of the cross-attention K/V precompute.

    ck/cv: (L, B, H, dh, T). Each (dh,) column t gets one scale (amax/127):
    the score dot contracts over dh, so the K scale factors out of the dot
    (scores * s_k), and the V scale folds into the softmax weights before
    the AV dot (w * s_v) — both exact factorizations, no requantization
    error beyond the column quantization itself. These are ACTIVATION
    tensors (computed per window by the frontend), read in full by every
    decode step: 76 us/step of the turbo int8 step's 425 us was cross-K/V
    reads at full HBM bandwidth.

    Returns ((ck_i8, ck_scale), (cv_i8, cv_scale)) with scales (L, B, H, T)
    float32."""
    return quantize_cross_kv_math(ck, cv)


def quantize_decoder(dec: Dict, quantize_embedding: bool = True) -> Dict:
    """Return a copy of the decoder param tree with the step-loop weights
    quantized to int8 + '@scale' siblings. Runs on device (jitted), so the
    one-time cost is a single pass over the weights in HBM."""
    out = dict(dec)
    blocks = dict(dec["blocks"])
    for key in DECODER_QUANT_KEYS:
        wi8, scale = _quantize_k_major(blocks[key])
        blocks[key] = wi8
        blocks[key + "@scale"] = scale
    out["blocks"] = blocks
    if quantize_embedding:
        wi8, scale = _quantize_rows(dec["tok_emb"])
        out["tok_emb"] = wi8
        out["tok_emb@scale"] = scale
    return out
