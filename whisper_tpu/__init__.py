"""whisper_tpu: a TPU-native Whisper ASR inference framework.

Public API mirrors openai/whisper (and the wangchou/whisper.coreml fork this
framework re-implements for TPU): `load_model`, `available_models`,
`transcribe`, `decode`, `DecodingOptions`, `DecodingResult`,
`detect_language`, `log_mel_spectrogram`, `pad_or_trim`, `load_audio`.
"""

import os
from typing import Optional

from .audio import load_audio, log_mel_spectrogram, pad_or_trim
from .decoding import DecodingOptions, DecodingResult, decode, detect_language
from .models import MODEL_DIMS, ModelDimensions, Whisper
from .models.params import (
    load_params_npz,
    params_from_torch_state_dict,
    save_params_npz,
)
from .models.registry import ALIGNMENT_HEADS, available_models, download_checkpoint
from .batch import transcribe_batch, transcribe_chunked
from .continuous import ContinuousBatcher
from .streaming import StreamingTranscriber
from .transcribe import transcribe
from .version import __version__

__all__ = [
    "DecodingOptions",
    "DecodingResult",
    "ModelDimensions",
    "Whisper",
    "available_models",
    "decode",
    "detect_language",
    "load_audio",
    "load_model",
    "log_mel_spectrogram",
    "pad_or_trim",
    "transcribe",
    "transcribe_batch",
    "transcribe_chunked",
    "StreamingTranscriber",
    "ContinuousBatcher",
    "__version__",
]


def _load_torch_checkpoint(path: str):
    """Read an openai/whisper .pt checkpoint (requires torch, CPU only)."""
    import torch

    with open(path, "rb") as fp:
        checkpoint = torch.load(fp, map_location="cpu", weights_only=False)
    dims = ModelDimensions(**checkpoint["dims"])
    params = params_from_torch_state_dict(checkpoint["model_state_dict"], dims)
    return dims, params


def load_model(
    name: str,
    download_root: Optional[str] = None,
    compute_dtype: str = "bfloat16",
    device=None,  # accepted for API compatibility; placement is XLA's concern
) -> Whisper:
    """Load a Whisper model by registry name (downloading + SHA256-verifying
    the official checkpoint if needed) or from a local .pt / .npz file."""
    alignment_heads = None

    if name in MODEL_DIMS:
        checkpoint_path = download_checkpoint(name, download_root)
        alignment_heads = ALIGNMENT_HEADS[name]
        dims, params = _load_torch_checkpoint(checkpoint_path)
    elif os.path.isdir(name) and os.path.exists(os.path.join(name, "dims.json")):
        # orbax checkpoint directory (checkpoint.py — e.g. a fine-tuned
        # model written by whisper_tpu.finetune)
        from .checkpoint import load_checkpoint

        params, dims, _ = load_checkpoint(name)
    elif os.path.isfile(name):
        if name.endswith(".npz"):
            tree = load_params_npz(name)
            dims = ModelDimensions(
                **{k: int(v) for k, v in tree.pop("dims").items()}
            )
            params = tree["params"] if "params" in tree else tree
        else:
            dims, params = _load_torch_checkpoint(name)
    else:
        raise RuntimeError(
            f"Model {name} not found; available models = {available_models()}"
        )

    model = Whisper(dims, params, name=name, compute_dtype=compute_dtype)
    if alignment_heads is not None:
        model.set_alignment_heads(alignment_heads)
    return model


def save_model(model: Whisper, path: str):
    """Serialize a model (dims + float32 params) to our .npz format."""
    import numpy as np

    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}{k}/")
            else:
                flat[f"{prefix}{k}"] = np.asarray(v, dtype=np.float32)

    walk(model.params, "params/")
    for k, v in model.dims.__dict__.items():
        flat[f"dims/{k}"] = np.int64(v)
    np.savez(path, **flat)
