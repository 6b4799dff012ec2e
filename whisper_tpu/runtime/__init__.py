from .native import decode_audio_native, f32_to_bf16, bf16_to_f32, native_available

__all__ = ["decode_audio_native", "f32_to_bf16", "bf16_to_f32", "native_available"]
