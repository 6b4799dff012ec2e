"""Parameter pytrees: initialization, checkpoint conversion, serialization.

Parameters live in plain nested dicts of arrays. Per-layer weights are
STACKED along a leading layer axis — e.g. encoder q-projection is one
(n_layer, d, d) array — which keeps the compiled graph count independent of
depth (`lax.scan` over layers), makes tensor-parallel sharding a single
annotation per stack, and avoids python-loop graph bloat that the reference
worked around by splitting its encoder into 12-layer sub-models
(/root/reference/whisper/encoder.py:114-136).

Linear weights are stored (in_features, out_features), i.e. transposed from
torch's Linear layout, so applications are `x @ w + b`.
"""

from typing import Dict, Optional

import numpy as np

from .dims import ModelDimensions


def sinusoid_position_embedding(length: int, channels: int, max_timescale=10000):
    """Fixed sinusoidal embedding used by the audio encoder."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


def _stack(arrays):
    return np.stack([np.asarray(a, dtype=np.float32) for a in arrays])


def _build_param_tree(dims: ModelDimensions, w, zeros, ones, pos_emb) -> Dict:
    """Construct the parameter pytree from array factories: w(*shape) random
    weight, zeros/ones(*shape), pos_emb() the encoder sinusoids."""
    d = dims.n_audio_state
    dt = dims.n_text_state
    La, Lt = dims.n_audio_layer, dims.n_text_layer

    def attn_block(n_layers, width, cross=False):
        blocks = {
            "attn_ln_g": ones(n_layers, width),
            "attn_ln_b": zeros(n_layers, width),
            "attn_q_w": w(n_layers, width, width),
            "attn_q_b": zeros(n_layers, width),
            "attn_k_w": w(n_layers, width, width),
            "attn_v_w": w(n_layers, width, width),
            "attn_v_b": zeros(n_layers, width),
            "attn_o_w": w(n_layers, width, width),
            "attn_o_b": zeros(n_layers, width),
            "mlp_ln_g": ones(n_layers, width),
            "mlp_ln_b": zeros(n_layers, width),
            "mlp_fc1_w": w(n_layers, width, 4 * width),
            "mlp_fc1_b": zeros(n_layers, 4 * width),
            "mlp_fc2_w": w(n_layers, 4 * width, width),
            "mlp_fc2_b": zeros(n_layers, width),
        }
        if cross:
            blocks.update(
                {
                    "cross_ln_g": ones(n_layers, width),
                    "cross_ln_b": zeros(n_layers, width),
                    "cross_q_w": w(n_layers, width, width),
                    "cross_q_b": zeros(n_layers, width),
                    "cross_k_w": w(n_layers, width, width),
                    "cross_v_w": w(n_layers, width, width),
                    "cross_v_b": zeros(n_layers, width),
                    "cross_o_w": w(n_layers, width, width),
                    "cross_o_b": zeros(n_layers, width),
                }
            )
        return blocks

    return {
        "encoder": {
            "conv1_w": w(d, dims.n_mels, 3),
            "conv1_b": zeros(d),
            "conv2_w": w(d, d, 3),
            "conv2_b": zeros(d),
            "pos_emb": pos_emb(),
            "blocks": attn_block(La, d),
            "ln_post_g": ones(d),
            "ln_post_b": zeros(d),
        },
        "decoder": {
            "tok_emb": w(dims.n_vocab, dt),
            "pos_emb": w(dims.n_text_ctx, dt),
            "blocks": attn_block(Lt, dt, cross=True),
            "ln_g": ones(dt),
            "ln_b": zeros(dt),
        },
    }


def init_random_params(dims: ModelDimensions, seed: int = 0) -> Dict:
    """Random host (numpy) parameters with GPT-style scaling; used by tests
    and small-model experiments when no checkpoint is available."""
    rng = np.random.RandomState(seed)

    def w(*shape):
        return rng.normal(0.0, 0.02, size=shape).astype(np.float32)

    def zeros(*shape):
        return np.zeros(shape, dtype=np.float32)

    def ones(*shape):
        return np.ones(shape, dtype=np.float32)

    def pos_emb():
        return sinusoid_position_embedding(dims.n_audio_ctx, dims.n_audio_state)

    return _build_param_tree(dims, w, zeros, ones, pos_emb)


def init_random_params_device(dims: ModelDimensions, seed: int = 0, dtype="bfloat16") -> Dict:
    """Synthetic parameters generated ON DEVICE inside one jit, avoiding the
    multi-GB host->device weight transfer host-side init would need (the TPU
    here sits behind a network tunnel). Used by benchmarks and compile checks
    at turbo/large scale.

    Default fill is a deterministic chirp (sin over iota at an irrational
    stride, zero-mean, amplitude 0.02): statistically arbitrary exactly like
    the old per-tensor threefry normals — TPU op timing is data-independent,
    so the benchmarks cannot tell the difference — but it compiles to ~5 ops
    per tensor instead of a full counter-RNG subgraph. That matters because
    the remote TPU service compiles every program server-side on its first
    execution: the threefry init program for turbo (7.4 MB of StableHLO) cost
    each fresh bench worker ~90 s of server compile before warmup could even
    start. WHISPER_TPU_INIT=rng restores true threefry normals."""
    import os

    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype)
    use_rng = os.environ.get("WHISPER_TPU_INIT") == "rng"

    @jax.jit
    def build():
        counter = [0]
        key = jax.random.PRNGKey(seed)

        def w(*shape):
            counter[0] += 1
            if use_rng:
                k = jax.random.fold_in(key, counter[0])
                return (jax.random.normal(k, shape, dtype=jnp.float32) * 0.02).astype(
                    dtype
                )
            size = 1
            for s in shape:
                size *= s
            i = jnp.arange(size, dtype=jnp.float32)
            # golden-angle chirp: decorrelated across tensors via the seed-
            # and counter-dependent phase/stride, bounded in [-0.02, 0.02]
            stride = 0.7548776662466927 + 1e-3 * (counter[0] % 97)
            phase = 2.3999632297286533 * (counter[0] + 1) + float(seed)
            vals = jnp.sin(i * stride + phase) * 0.02
            return vals.reshape(shape).astype(dtype)

        def zeros(*shape):
            return jnp.zeros(shape, dtype=dtype)

        def ones(*shape):
            return jnp.ones(shape, dtype=dtype)

        def pos_emb():
            return jnp.asarray(
                sinusoid_position_embedding(dims.n_audio_ctx, dims.n_audio_state),
                dtype=dtype,
            )

        return _build_param_tree(dims, w, zeros, ones, pos_emb)

    return build()


def params_from_torch_state_dict(state_dict, dims: ModelDimensions) -> Dict:
    """Convert an openai/whisper-format torch state dict (the reference's
    checkpoint payload, see /root/reference/whisper/__init__.py:152-163) into
    our stacked-layer pytree. Accepts torch tensors or numpy arrays."""

    def get(name) -> np.ndarray:
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    def maybe(name) -> Optional[np.ndarray]:
        return get(name) if name in state_dict else None

    def linear_w(name):
        return get(name).T.copy()  # (out,in) -> (in,out)

    def enc_blocks():
        L = dims.n_audio_layer
        p = "encoder.blocks"
        return {
            "attn_ln_g": _stack([get(f"{p}.{i}.attn_ln.weight") for i in range(L)]),
            "attn_ln_b": _stack([get(f"{p}.{i}.attn_ln.bias") for i in range(L)]),
            "attn_q_w": _stack([linear_w(f"{p}.{i}.attn.query.weight") for i in range(L)]),
            "attn_q_b": _stack([get(f"{p}.{i}.attn.query.bias") for i in range(L)]),
            "attn_k_w": _stack([linear_w(f"{p}.{i}.attn.key.weight") for i in range(L)]),
            "attn_v_w": _stack([linear_w(f"{p}.{i}.attn.value.weight") for i in range(L)]),
            "attn_v_b": _stack([get(f"{p}.{i}.attn.value.bias") for i in range(L)]),
            "attn_o_w": _stack([linear_w(f"{p}.{i}.attn.out.weight") for i in range(L)]),
            "attn_o_b": _stack([get(f"{p}.{i}.attn.out.bias") for i in range(L)]),
            "mlp_ln_g": _stack([get(f"{p}.{i}.mlp_ln.weight") for i in range(L)]),
            "mlp_ln_b": _stack([get(f"{p}.{i}.mlp_ln.bias") for i in range(L)]),
            "mlp_fc1_w": _stack([linear_w(f"{p}.{i}.mlp.0.weight") for i in range(L)]),
            "mlp_fc1_b": _stack([get(f"{p}.{i}.mlp.0.bias") for i in range(L)]),
            "mlp_fc2_w": _stack([linear_w(f"{p}.{i}.mlp.2.weight") for i in range(L)]),
            "mlp_fc2_b": _stack([get(f"{p}.{i}.mlp.2.bias") for i in range(L)]),
        }

    def dec_blocks():
        L = dims.n_text_layer
        p = "decoder.blocks"
        blocks = {
            "attn_ln_g": _stack([get(f"{p}.{i}.attn_ln.weight") for i in range(L)]),
            "attn_ln_b": _stack([get(f"{p}.{i}.attn_ln.bias") for i in range(L)]),
            "attn_q_w": _stack([linear_w(f"{p}.{i}.attn.query.weight") for i in range(L)]),
            "attn_q_b": _stack([get(f"{p}.{i}.attn.query.bias") for i in range(L)]),
            "attn_k_w": _stack([linear_w(f"{p}.{i}.attn.key.weight") for i in range(L)]),
            "attn_v_w": _stack([linear_w(f"{p}.{i}.attn.value.weight") for i in range(L)]),
            "attn_v_b": _stack([get(f"{p}.{i}.attn.value.bias") for i in range(L)]),
            "attn_o_w": _stack([linear_w(f"{p}.{i}.attn.out.weight") for i in range(L)]),
            "attn_o_b": _stack([get(f"{p}.{i}.attn.out.bias") for i in range(L)]),
            "cross_ln_g": _stack([get(f"{p}.{i}.cross_attn_ln.weight") for i in range(L)]),
            "cross_ln_b": _stack([get(f"{p}.{i}.cross_attn_ln.bias") for i in range(L)]),
            "cross_q_w": _stack([linear_w(f"{p}.{i}.cross_attn.query.weight") for i in range(L)]),
            "cross_q_b": _stack([get(f"{p}.{i}.cross_attn.query.bias") for i in range(L)]),
            "cross_k_w": _stack([linear_w(f"{p}.{i}.cross_attn.key.weight") for i in range(L)]),
            "cross_v_w": _stack([linear_w(f"{p}.{i}.cross_attn.value.weight") for i in range(L)]),
            "cross_v_b": _stack([get(f"{p}.{i}.cross_attn.value.bias") for i in range(L)]),
            "cross_o_w": _stack([linear_w(f"{p}.{i}.cross_attn.out.weight") for i in range(L)]),
            "cross_o_b": _stack([get(f"{p}.{i}.cross_attn.out.bias") for i in range(L)]),
            "mlp_ln_g": _stack([get(f"{p}.{i}.mlp_ln.weight") for i in range(L)]),
            "mlp_ln_b": _stack([get(f"{p}.{i}.mlp_ln.bias") for i in range(L)]),
            "mlp_fc1_w": _stack([linear_w(f"{p}.{i}.mlp.0.weight") for i in range(L)]),
            "mlp_fc1_b": _stack([get(f"{p}.{i}.mlp.0.bias") for i in range(L)]),
            "mlp_fc2_w": _stack([linear_w(f"{p}.{i}.mlp.2.weight") for i in range(L)]),
            "mlp_fc2_b": _stack([get(f"{p}.{i}.mlp.2.bias") for i in range(L)]),
        }
        return blocks

    enc_pos = maybe("encoder.positional_embedding")
    if enc_pos is None:
        enc_pos = sinusoid_position_embedding(dims.n_audio_ctx, dims.n_audio_state)

    return {
        "encoder": {
            "conv1_w": get("encoder.conv1.weight"),
            "conv1_b": get("encoder.conv1.bias"),
            "conv2_w": get("encoder.conv2.weight"),
            "conv2_b": get("encoder.conv2.bias"),
            "pos_emb": enc_pos,
            "blocks": enc_blocks(),
            "ln_post_g": get("encoder.ln_post.weight"),
            "ln_post_b": get("encoder.ln_post.bias"),
        },
        "decoder": {
            "tok_emb": get("decoder.token_embedding.weight"),
            "pos_emb": get("decoder.positional_embedding"),
            "blocks": dec_blocks(),
            "ln_g": get("decoder.ln.weight"),
            "ln_b": get("decoder.ln.bias"),
        },
    }


def _flatten(tree: Dict, prefix: str = ""):
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _flatten(v, key + "/")
        else:
            yield key, v


def save_params_npz(params: Dict, path: str):
    np.savez(path, **dict(_flatten(params)))


def load_params_npz(path: str) -> Dict:
    flat = np.load(path)
    tree: Dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
