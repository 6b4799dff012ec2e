"""Model dimension registry for every Whisper family the reference supports.

The reference derives dims from the checkpoint payload
(/root/reference/whisper/model.py:18-30); we additionally keep a static table
so random-initialized models, shape planning, and ahead-of-time compilation
work without a checkpoint in hand.
"""

from dataclasses import dataclass


@dataclass(frozen=True)
class ModelDimensions:
    n_mels: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_vocab: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int

    @property
    def head_dim(self) -> int:
        return self.n_text_state // self.n_text_head


def _dims(width, heads, audio_layers, text_layers=None, n_mels=80, n_vocab=51865):
    return ModelDimensions(
        n_mels=n_mels,
        n_audio_ctx=1500,
        n_audio_state=width,
        n_audio_head=heads,
        n_audio_layer=audio_layers,
        n_vocab=n_vocab,
        n_text_ctx=448,
        n_text_state=width,
        n_text_head=heads,
        n_text_layer=text_layers if text_layers is not None else audio_layers,
    )


MODEL_DIMS = {
    "tiny.en": _dims(384, 6, 4, n_vocab=51864),
    "tiny": _dims(384, 6, 4),
    "base.en": _dims(512, 8, 6, n_vocab=51864),
    "base": _dims(512, 8, 6),
    "small.en": _dims(768, 12, 12, n_vocab=51864),
    "small": _dims(768, 12, 12),
    "medium.en": _dims(1024, 16, 24, n_vocab=51864),
    "medium": _dims(1024, 16, 24),
    "large-v1": _dims(1280, 20, 32),
    "large-v2": _dims(1280, 20, 32),
    "large-v3": _dims(1280, 20, 32, n_mels=128, n_vocab=51866),
    "large": _dims(1280, 20, 32, n_mels=128, n_vocab=51866),
    "large-v3-turbo": _dims(1280, 20, 32, text_layers=4, n_mels=128, n_vocab=51866),
    "turbo": _dims(1280, 20, 32, text_layers=4, n_mels=128, n_vocab=51866),
}
