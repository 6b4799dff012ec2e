"""Pipeline-parallel encoder (GPipe-style) over a mesh's `pp` axis.

The reference splits its encoder into <=12-layer sub-models purely to tame
ANECompiler time, then runs the chunks SEQUENTIALLY on one device, chained
through a single shared buffer (/root/reference/whisper/encoder.py:114-136,
/root/reference/coreml/coreml.mm:26-100). This module is the TPU-native
re-imagining of that split: the layer stack is sharded over `pp` mesh
devices (stage s holds layers [s*L/pp, (s+1)*L/pp)), the batch is cut into
microbatches, and activations flow stage-to-stage over ICI via
`lax.ppermute` while every stage works on a different microbatch — the
chunks run CONCURRENTLY instead of back-to-back.

When to use it: throughput serving of DEEP encoders (large-v3: 32 layers)
at batch sizes big enough to amortize the (pp-1)/(M+pp-1) pipeline bubble,
or when per-chip weight memory matters (each stage holds 1/pp of the
encoder). The single-chip latency path deliberately stays unpipelined
(parallel/sharding.py's rationale): whisper encoders fit one chip and the
decode loop, not the encoder, bounds clip latency.

Composition: the mesh may also carry `dp` (microbatch streams split over
data-parallel groups; each group runs its own pipeline) and `tp` (megatron
head/hidden sharding INSIDE a stage, with explicit psum over `tp` after the
row-parallel matmuls — inside shard_map the collectives are written by
hand rather than inferred by GSPMD).

Everything is one jitted program; XLA overlaps each stage's compute with
the ppermute transfers where the dependence allows.
"""

import inspect
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.graphs import _gelu, _self_attention, layer_norm

try:  # jax >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _sm
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _sm

# the replication-check kwarg was renamed check_rep -> check_vma; which name
# a given jax release takes is independent of where shard_map is exported
_SM_PARAMS = inspect.signature(_sm).parameters
_SM_CHECK_KW = next(
    (kw for kw in ("check_vma", "check_rep") if kw in _SM_PARAMS), None
)


def _shard_map(f, mesh, in_specs, out_specs):
    kw = {_SM_CHECK_KW: False} if _SM_CHECK_KW else {}
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


# column-parallel (output features over tp) / row-parallel (input features
# over tp) weight names — same rules as parallel/sharding.py, minus the
# leading stacked-layer axis which is sharded over pp here
_COL_W = {"attn_q_w", "attn_k_w", "attn_v_w", "mlp_fc1_w"}
_ROW_W = {"attn_o_w", "mlp_fc2_w"}
_COL_B = {"attn_q_b", "attn_v_b", "mlp_fc1_b"}


def _encoder_specs(enc: Dict, tp: int) -> Dict:
    """PartitionSpec tree for the encoder params: blocks sharded over pp on
    the layer axis (+ tp on the megatron axes); stem/ln_post replicated."""
    t = "tp" if tp > 1 else None

    def block_spec(name: str, leaf) -> P:
        if name in _COL_W:
            return P("pp", None, t)
        if name in _ROW_W:
            return P("pp", t, None)
        if name in _COL_B:
            return P("pp", t)
        return P("pp", *([None] * (leaf.ndim - 1)))

    return {
        k: (
            {n: block_spec(n, leaf) for n, leaf in v.items()}
            if k == "blocks"
            else P()
        )
        for k, v in enc.items()
    }


def pp_encode(model, mesh: Mesh, microbatches: int = 0):
    """Build a jitted pipeline-parallel encoder: mel (B, n_mels, frames) ->
    (B, frames//2, d) audio features, numerically matching graphs.encode.

    `mesh` must have a `pp` axis with n_audio_layer % pp == 0; `dp`/`tp`
    axes compose (B % (dp * microbatches) == 0, n_audio_head % tp == 0).
    `microbatches` is PER dp GROUP and defaults to the pp degree (bubble
    fraction (pp-1)/(2*pp-1)); raise it when the batch allows.
    """
    dims = model.dims
    shape = dict(mesh.shape)
    pp = shape.get("pp", 1)
    tp = shape.get("tp", 1)
    assert pp > 1, "pp_encode needs a mesh with a pp axis of size > 1"
    assert dims.n_audio_layer % pp == 0, (
        f"{dims.n_audio_layer} encoder layers not divisible by pp={pp}"
    )
    assert dims.n_audio_head % tp == 0
    n_micro = microbatches or pp
    n_head_local = dims.n_audio_head // tp

    def stage_layers(x, blocks):
        """This stage's slice of the layer stack, tp-local heads + explicit
        psum completing the row-parallel o/fc2 matmuls (graphs.encode:213)."""

        def block(x, blk):
            h = layer_norm(x, blk["attn_ln_g"], blk["attn_ln_b"], eps=1e-7)
            q = h @ blk["attn_q_w"] + blk["attn_q_b"]
            k = h @ blk["attn_k_w"]
            v = h @ blk["attn_v_w"] + blk["attn_v_b"]
            part = _self_attention(q, k, v, None, n_head_local) @ blk["attn_o_w"]
            if tp > 1:
                part = jax.lax.psum(part, "tp")
            x = x + part + blk["attn_o_b"]

            h = layer_norm(x, blk["mlp_ln_g"], blk["mlp_ln_b"], eps=1e-7)
            part = _gelu(h @ blk["mlp_fc1_w"] + blk["mlp_fc1_b"]) @ blk["mlp_fc2_w"]
            if tp > 1:
                part = jax.lax.psum(part, "tp")
            return x + part + blk["mlp_fc2_b"], None

        x, _ = jax.lax.scan(block, x, blocks)
        return x

    def f(enc, mel):
        dtype = enc["blocks"]["attn_q_w"].dtype
        # conv stem + sinusoidal pos-emb (graphs.encode:195-211), computed on
        # every stage — trivially cheap next to the layer stack, and cheaper
        # than a broadcast of the stem output
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

        Bl, T, d = x.shape
        assert Bl % n_micro == 0, (
            f"local batch {Bl} not divisible by microbatches={n_micro}"
        )
        mb = Bl // n_micro
        x_mb = x.reshape(n_micro, mb, T, d)

        s = jax.lax.axis_index("pp")
        perm = [(i, i + 1) for i in range(pp - 1)]

        def tick(carry, t):
            # GPipe schedule: at tick t, stage s runs microbatch t-s. Off-
            # schedule ticks (the bubble) compute on garbage and are masked
            # out at the store/receive points — branch-free, so the whole
            # pipeline is one lax.scan.
            recv, outs = carry
            inp = jnp.where(s == 0, x_mb[jnp.clip(t, 0, n_micro - 1)], recv)
            out = stage_layers(inp, enc["blocks"])
            nxt = jax.lax.ppermute(out, "pp", perm)
            m = t - (pp - 1)  # microbatch the LAST stage just finished
            fin = layer_norm(out, enc["ln_post_g"], enc["ln_post_b"], eps=1e-7)
            stored = jax.lax.dynamic_update_index_in_dim(
                outs, fin, jnp.clip(m, 0, n_micro - 1), 0
            )
            outs = jnp.where((s == pp - 1) & (m >= 0), stored, outs)
            return (nxt, outs), None

        init = (
            jnp.zeros((mb, T, d), dtype),
            jnp.zeros((n_micro, mb, T, d), dtype),
        )
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(n_micro + pp - 1))
        # the finished activations live on the last stage; psum broadcasts
        # them so every pp rank returns the same (replicated) output
        outs = jax.lax.psum(jnp.where(s == pp - 1, outs, jnp.zeros_like(outs)), "pp")
        return outs.reshape(Bl, T, d)

    enc = model.params["encoder"]
    dp_axis = "dp" if shape.get("dp", 1) > 1 else None
    fn = _shard_map(
        f,
        mesh,
        in_specs=(_encoder_specs(enc, tp), P(dp_axis, None, None)),
        out_specs=P(dp_axis, None, None),
    )
    return jax.jit(fn)
