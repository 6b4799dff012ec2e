from .native import (
    bf16_to_f32,
    decode_audio_native,
    f32_to_bf16,
    log_mel_native,
    native_available,
)

__all__ = [
    "bf16_to_f32",
    "decode_audio_native",
    "f32_to_bf16",
    "log_mel_native",
    "native_available",
]
