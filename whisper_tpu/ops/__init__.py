from .mel import mel_filterbank
from .stft import log_mel_spectrogram_np, log_mel_spectrogram_jax

__all__ = ["mel_filterbank", "log_mel_spectrogram_np", "log_mel_spectrogram_jax"]
