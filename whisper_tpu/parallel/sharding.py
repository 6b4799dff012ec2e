"""Parameter/activation sharding rules (megatron-style tensor parallelism).

Stacked-layer param layout (models/params.py) makes each rule one annotation
per weight stack:

  * q/k/v and MLP fc1: shard the OUTPUT feature axis over `tp` (heads split
    across chips — n_head % tp must be 0);
  * attention out-proj and MLP fc2: shard the INPUT feature axis over `tp`
    (XLA inserts the all-reduce that completes the row-parallel matmul);
  * embeddings, layernorms, conv stem: replicated;
  * batch axes of activations: sharded over `dp`.

No pipeline axis HERE: Whisper decoders are shallow (4 layers for turbo)
and the hot graph is latency-bound single-token decoding — pipelining the
decode loop would add bubble latency for no memory win at these sizes. The
deep ENCODER (32 layers for large-v3) does get an opt-in GPipe pipeline for
batch serving: parallel/pipeline.py shards the layer stack over a `pp` mesh
axis with microbatched ppermute flow, composing with the dp/tp rules below.
No expert axis: the architecture has no MoE layers.
"""

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# mapping: param name suffix -> PartitionSpec for the (L, in, out) stacks
_BLOCK_RULES = {
    "attn_q_w": P(None, None, "tp"),
    "attn_q_b": P(None, "tp"),
    "attn_k_w": P(None, None, "tp"),
    "attn_v_w": P(None, None, "tp"),
    "attn_v_b": P(None, "tp"),
    "attn_o_w": P(None, "tp", None),
    "attn_o_b": P(None, None),
    "cross_q_w": P(None, None, "tp"),
    "cross_q_b": P(None, "tp"),
    "cross_k_w": P(None, None, "tp"),
    "cross_v_w": P(None, None, "tp"),
    "cross_v_b": P(None, "tp"),
    "cross_o_w": P(None, "tp", None),
    "cross_o_b": P(None, None),
    "mlp_fc1_w": P(None, None, "tp"),
    "mlp_fc1_b": P(None, "tp"),
    "mlp_fc2_w": P(None, "tp", None),
    "mlp_fc2_b": P(None, None),
}


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """PartitionSpec tree matching the params tree."""

    def spec_for(path: str, leaf) -> NamedSharding:
        name = path.rsplit("/", 1)[-1]
        if name.endswith("@scale"):
            # int8 weight-only scale (quant.py): (L, N) per-output-channel —
            # shard like the weight's output axis (replicated for the
            # row-parallel o/fc2 weights, whose output axis is unsharded)
            base = _BLOCK_RULES.get(name[: -len("@scale")])
            if base is not None and mesh.shape.get("tp", 1) > 1:
                return NamedSharding(mesh, P(base[0], base[2]))
            return NamedSharding(mesh, P())
        spec = _BLOCK_RULES.get(name)
        if spec is None or mesh.shape.get("tp", 1) == 1:
            spec = P()  # replicated (embeddings, LNs, convs)
        return NamedSharding(mesh, spec)

    def walk(tree, prefix=""):
        return {
            k: (
                walk(v, f"{prefix}{k}/")
                if isinstance(v, dict)
                else spec_for(f"{prefix}{k}", v)
            )
            for k, v in tree.items()
        }

    return walk(params)


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Place params on the mesh according to the tp rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
