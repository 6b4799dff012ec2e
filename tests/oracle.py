"""Test utilities: run the reference implementation (/root/reference, torch
CPU path) as a numerics oracle on synthetic random checkpoints.

The reference imports numba (for its DTW CPU fallback), which is not
installed here; we register a minimal stub whose @jit is a no-op decorator —
the decorated functions then run as plain Python, which is fine at test
sizes.
"""

import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


def _install_numba_stub():
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")

    def jit(*args, **kwargs):
        def wrap(fn):
            return fn

        if args and callable(args[0]) and not kwargs:
            return args[0]
        return wrap

    numba.jit = jit
    numba.njit = jit
    sys.modules["numba"] = numba


def import_reference_whisper():
    """Import the reference `whisper` package from /root/reference."""
    _install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import whisper as ref_whisper  # noqa

    return ref_whisper


def make_random_state_dict(dims, seed=0, scale=0.4):
    """Random openai/whisper-format checkpoint weights (torch tensors).

    `scale` tunes weight magnitude so forward activations are O(1) and
    greedy decoding is stable enough for token-level comparison. Head dim
    must be 64 (the reference hardcodes it, decoder.py:62-64).
    """
    import torch

    rng = np.random.RandomState(seed)

    def t(*shape, s=None):
        s = scale / np.sqrt(shape[-1]) if s is None else s
        return torch.from_numpy(rng.normal(0, s, size=shape).astype(np.float32))

    d = dims.n_audio_state
    sd = {}
    sd["encoder.conv1.weight"] = t(d, dims.n_mels, 3)
    sd["encoder.conv1.bias"] = t(d, s=0.02)
    sd["encoder.conv2.weight"] = t(d, d, 3)
    sd["encoder.conv2.bias"] = t(d, s=0.02)

    from whisper_tpu.models.params import sinusoid_position_embedding

    sd["encoder.positional_embedding"] = torch.from_numpy(
        sinusoid_position_embedding(dims.n_audio_ctx, d)
    )

    def block(prefix, width, cross=False):
        sd[f"{prefix}.attn_ln.weight"] = torch.ones(width)
        sd[f"{prefix}.attn_ln.bias"] = torch.zeros(width)
        for mod in ["attn"] + (["cross_attn"] if cross else []):
            sd[f"{prefix}.{mod}.query.weight"] = t(width, width)
            sd[f"{prefix}.{mod}.query.bias"] = t(width, s=0.02)
            sd[f"{prefix}.{mod}.key.weight"] = t(width, width)
            sd[f"{prefix}.{mod}.value.weight"] = t(width, width)
            sd[f"{prefix}.{mod}.value.bias"] = t(width, s=0.02)
            sd[f"{prefix}.{mod}.out.weight"] = t(width, width)
            sd[f"{prefix}.{mod}.out.bias"] = t(width, s=0.02)
        if cross:
            sd[f"{prefix}.cross_attn_ln.weight"] = torch.ones(width)
            sd[f"{prefix}.cross_attn_ln.bias"] = torch.zeros(width)
        sd[f"{prefix}.mlp_ln.weight"] = torch.ones(width)
        sd[f"{prefix}.mlp_ln.bias"] = torch.zeros(width)
        sd[f"{prefix}.mlp.0.weight"] = t(4 * width, width)
        sd[f"{prefix}.mlp.0.bias"] = t(4 * width, s=0.02)
        sd[f"{prefix}.mlp.2.weight"] = t(width, 4 * width)
        sd[f"{prefix}.mlp.2.bias"] = t(width, s=0.02)

    for i in range(dims.n_audio_layer):
        block(f"encoder.blocks.{i}", d)
    sd["encoder.ln_post.weight"] = torch.ones(d)
    sd["encoder.ln_post.bias"] = torch.zeros(d)

    dt = dims.n_text_state
    sd["decoder.token_embedding.weight"] = t(dims.n_vocab, dt, s=0.02)
    sd["decoder.positional_embedding"] = t(dims.n_text_ctx, dt, s=0.01)
    for i in range(dims.n_text_layer):
        block(f"decoder.blocks.{i}", dt, cross=True)
    sd["decoder.ln.weight"] = torch.ones(dt)
    sd["decoder.ln.bias"] = torch.zeros(dt)
    return sd


def save_reference_checkpoint(path, dims, seed=0, scale=0.4):
    """Write a .pt checkpoint the reference load_model() understands."""
    import torch

    sd = make_random_state_dict(dims, seed=seed, scale=scale)
    torch.save({"dims": dims.__dict__, "model_state_dict": sd}, path)
    return path


def load_reference_model(checkpoint_path):
    """whisper.load_model() on the reference package (CPU, no coreml)."""
    ref = import_reference_whisper()
    return ref.load_model(checkpoint_path, device="cpu", use_coreml=False)
