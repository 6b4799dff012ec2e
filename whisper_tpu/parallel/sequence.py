"""Sequence-parallel encoder: the 1500-frame audio context sharded over an
`sp` mesh axis.

The reference never shards a sequence — its longest axis (the encoder's 1500
audio frames, /root/reference/whisper/encoder.py:82-136) always lives on one
device. On TPU the natural scale-out for that axis is sequence parallelism:
each `sp` rank owns T/sp frames end to end through the layer stack.
LayerNorm/MLP/projections are per-position, so they need no communication at
all; only attention needs the full key/value set, which each layer fetches
with one tiled `all_gather` over `sp` (K and V, each (B, T, d/tp) — at
whisper scale the gather is tiny next to the matmuls, so the simple
gather-everything form beats ring attention's pipelining complexity).

Composition: `dp` splits the batch (each group runs its own sp ring), `tp`
megatron-splits heads/hidden inside each rank (explicit psum completes the
row-parallel o/fc2 matmuls, as in parallel/pipeline.py). The conv stem is
computed replicated on every sp rank — it is ~1% of encoder FLOPs and
cheaper than a halo exchange for the overlapping stride-2 convs.

When to use it: activation-memory-bound encodes (very large batches of
windows on small chips) or future long-context encoder variants; for the
stock 1500-frame encoder on one chip the unsharded graphs.encode remains
the latency path.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.graphs import _gelu, _self_attention, layer_norm
from .pipeline import _COL_B, _COL_W, _ROW_W, _shard_map


def _encoder_specs_sp(enc: Dict, tp: int) -> Dict:
    """PartitionSpec tree: layer stack replicated (stacked layer axis NOT
    sharded — every sp rank runs every layer), tp on the megatron axes."""
    t = "tp" if tp > 1 else None

    def block_spec(name: str, leaf) -> P:
        if name in _COL_W:
            return P(None, None, t)
        if name in _ROW_W:
            return P(None, t, None)
        if name in _COL_B:
            return P(None, t)
        return P(*([None] * leaf.ndim))

    return {
        k: (
            {n: block_spec(n, leaf) for n, leaf in v.items()}
            if k == "blocks"
            else P()
        )
        for k, v in enc.items()
    }


def sp_encode(model, mesh: Mesh):
    """Build a jitted sequence-parallel encoder: mel (B, n_mels, frames) ->
    (B, frames//2, d) audio features, numerically matching graphs.encode.

    `mesh` must carry an `sp` axis with (frames//2) % sp == 0; `dp`/`tp`
    compose (B % dp == 0, n_audio_head % tp == 0)."""
    dims = model.dims
    shape = dict(mesh.shape)
    sp = shape.get("sp", 1)
    tp = shape.get("tp", 1)
    assert sp > 1, "sp_encode needs a mesh with an sp axis of size > 1"
    assert dims.n_audio_head % tp == 0
    n_head_local = dims.n_audio_head // tp

    def f(enc, mel):
        dtype = enc["blocks"]["attn_q_w"].dtype
        # conv stem + pos-emb, replicated on every sp/tp rank (see module doc)
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
        x = jnp.transpose(x, (0, 2, 1)) + enc["pos_emb"].astype(dtype)

        T = x.shape[1]
        assert T % sp == 0, f"{T} frames not divisible by sp={sp}"
        t_loc = T // sp
        s = jax.lax.axis_index("sp")
        x = jax.lax.dynamic_slice_in_dim(x, s * t_loc, t_loc, axis=1)

        def block(x, blk):
            h = layer_norm(x, blk["attn_ln_g"], blk["attn_ln_b"], eps=1e-7)
            q = h @ blk["attn_q_w"] + blk["attn_q_b"]
            k = h @ blk["attn_k_w"]
            v = h @ blk["attn_v_w"] + blk["attn_v_b"]
            # local queries attend over the full frame axis: one tiled
            # all_gather each for K and V rebuilds (B, T, d/tp) per layer
            k = jax.lax.all_gather(k, "sp", axis=1, tiled=True)
            v = jax.lax.all_gather(v, "sp", axis=1, tiled=True)
            part = _self_attention(q, k, v, None, n_head_local) @ blk["attn_o_w"]
            if tp > 1:
                part = jax.lax.psum(part, "tp")
            x = x + part + blk["attn_o_b"]

            h = layer_norm(x, blk["mlp_ln_g"], blk["mlp_ln_b"], eps=1e-7)
            part = _gelu(h @ blk["mlp_fc1_w"] + blk["mlp_fc1_b"]) @ blk["mlp_fc2_w"]
            if tp > 1:
                part = jax.lax.psum(part, "tp")
            return x + part + blk["mlp_fc2_b"], None

        x, _ = jax.lax.scan(block, x, enc["blocks"])
        # ln_post is per-position: apply on the shard; out_specs reassembles
        return layer_norm(x, enc["ln_post_g"], enc["ln_post_b"], eps=1e-7)

    enc = model.params["encoder"]
    dp_axis = "dp" if shape.get("dp", 1) > 1 else None
    fn = _shard_map(
        f,
        mesh,
        in_specs=(_encoder_specs_sp(enc, tp), P(dp_axis, None, None)),
        out_specs=P(dp_axis, "sp", None),
    )
    return jax.jit(fn)
