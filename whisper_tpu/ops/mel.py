"""Mel filterbank construction.

The reference ships a precomputed `mel_filters.npz` generated with
librosa.filters.mel(sr=16000, n_fft=400, n_mels={80,128})
(/root/reference/whisper/audio.py:91-107). We generate the identical
Slaney-normalized triangular filterbank from the formula instead of shipping
the binary blob; tests assert agreement with the reference asset to <1e-8.
"""

from functools import lru_cache

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400


def _hz_to_mel(freq):
    """Slaney-style mel scale: linear below 1 kHz, logarithmic above."""
    freq = np.asanyarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_region = freq >= min_log_hz
        mels[log_region] = min_log_mel + np.log(freq[log_region] / min_log_hz) / logstep
    elif freq >= min_log_hz:
        mels = min_log_mel + np.log(freq / min_log_hz) / logstep
    return mels


def _mel_to_hz(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs[log_region] = min_log_hz * np.exp(logstep * (mels[log_region] - min_log_mel))
    return freqs


@lru_cache(maxsize=None)
def mel_filterbank(n_mels: int, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) float32 Slaney-normalized mel filterbank."""
    if n_mels not in (80, 128):
        raise ValueError(f"Unsupported n_mels: {n_mels} (expected 80 or 128)")

    fft_freqs = np.fft.rfftfreq(n=n_fft, d=1.0 / sr)
    mel_edges = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2))

    fdiff = np.diff(mel_edges)
    ramps = mel_edges[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: each filter integrates to ~constant energy
    enorm = 2.0 / (mel_edges[2 : n_mels + 2] - mel_edges[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)
