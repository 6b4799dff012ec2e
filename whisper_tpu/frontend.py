"""The audio -> encoder-features frontend as device programs.

One module owns every production path from a host waveform to decoder-ready
cross-attention K/V:

  * `clip_frontend` — a whole clip's contiguous 30 s windows as ONE device
    program: on-device log-mel (MXU real-DFT STFT, ops/stft.py) -> window
    stacking -> batched encoder -> cross-KV. Nothing intermediate leaves HBM
    and the clip costs one execute RPC on remote-PJRT backends. This is the
    program bench.py measures and the batched/serving paths use.
  * `batched_device_mel` / `batched_mel_windows` — multi-stream device mel
    (one upload + one program for N streams) and the per-round vmapped
    window slice for the lockstep batch transcriber (batch.py).
  * `device_mel_full` / `device_mel_window` (re-exported from ops/stft.py) —
    the sequential transcribe() orchestrator's full-file device mel and
    seek-addressed window slice.

The reference computes the mel on the host per file and ships float windows
to the accelerator (/root/reference/whisper/audio.py:110-157,
transcribe.py:287-297); here the waveform ships once (int16 when it is
16-bit-representable — half the bytes) and features are born on device.
"""

from functools import partial
from typing import List, Tuple

import numpy as np

from .audio import HOP_LENGTH, N_SAMPLES
from .ops.stft import device_mel_full, device_mel_window  # noqa: F401  (re-export)
from .ops.stft import log_mel_spectrogram_jax

N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def pack_audio(audio: np.ndarray, total_samples: int) -> np.ndarray:
    """Zero-pad a float32 waveform to `total_samples`, as int16 when every
    sample is exactly 16-bit-representable (the common case: s16 PCM decode,
    no resampling) — the device converts back as i/32768, bit-identical, at
    half the host->device bytes."""
    audio = np.asarray(audio, dtype=np.float32)
    n = audio.shape[-1]
    scaled = audio * 32768.0
    if np.all(np.abs(scaled) <= 32767) and np.array_equal(scaled, np.round(scaled)):
        packed = np.zeros(total_samples, dtype=np.int16)
        packed[:n] = scaled.astype(np.int16)
    else:
        packed = np.zeros(total_samples, dtype=np.float32)
        packed[:n] = audio
    return packed


_CLIP_JITS = {}


def clip_frontend(n_mels: int, n_audio_head: int, n_text_head: int, n_windows: int):
    """The jitted whole-clip frontend: (enc_params, dec_params, audio) ->
    (cK, cV) with the clip's `n_windows` 30 s windows batched on the audio
    axis: (L, n_windows, H, dh, 1500).

    `audio` must be (n_windows + 1) * N_SAMPLES samples (the trailing window
    is the standard 30 s zero pad; its frames only feed the STFT tail and the
    global-max dynamic-range compression, which silence cannot move).
    """
    key = (n_mels, n_audio_head, n_text_head, n_windows)
    if key not in _CLIP_JITS:
        import jax
        import jax.numpy as jnp

        from .models import graphs

        def frontend(enc, dec, audio):
            mel = log_mel_spectrogram_jax(audio, n_mels)
            windows = mel[:, : n_windows * N_FRAMES].reshape(
                n_mels, n_windows, N_FRAMES
            )
            windows = jnp.transpose(windows, (1, 0, 2))
            xa = graphs.encode(enc, windows, n_head=n_audio_head)
            return graphs.cross_kv(dec, xa, n_head=n_text_head)

        _CLIP_JITS[key] = jax.jit(frontend)
    return _CLIP_JITS[key]


def encode_clip(model, audio: np.ndarray):
    """Convenience wrapper: host waveform -> (cK, cV, n_windows) through the
    one-program clip frontend. Windows ride the audio axis of the returned
    cross-K/V, ready for the fused engine's audio-major batch layout."""
    audio = np.asarray(audio, dtype=np.float32)
    n_windows = max(1, -(-audio.shape[-1] // N_SAMPLES))
    packed = pack_audio(audio, (n_windows + 1) * N_SAMPLES)
    import jax.numpy as jnp

    fn = clip_frontend(
        model.dims.n_mels,
        model.dims.n_audio_head,
        model.dims.n_text_head,
        n_windows,
    )
    ck, cv = fn(model.params["encoder"], model.params["decoder"], jnp.asarray(packed))
    return ck, cv, n_windows


_SPEC_JITS = {}


def clip_frontend_spec(dims_t, dims_d, n_windows: int):
    """Speculative-decoding frontend: ONE device program producing BOTH the
    target's and the draft's cross-attention K/V for a clip.

    The models run their own encoders (a draft like tiny is 4 layers x 384
    wide — a few ms next to the target's encoder), but share the audio
    upload, the STFT magnitudes' input, and the single execute RPC. Returns
    (ck_t, cv_t, ck_d, cv_d)."""
    key = (
        dims_t.n_mels, dims_t.n_audio_head, dims_t.n_text_head,
        dims_d.n_mels, dims_d.n_audio_head, dims_d.n_text_head,
        n_windows,
    )
    if key not in _SPEC_JITS:
        import jax
        import jax.numpy as jnp

        from .models import graphs

        def frontend(enc_t, dec_t, enc_d, dec_d, audio):
            def one(enc, dec, n_mels, n_audio_head, n_text_head):
                mel = log_mel_spectrogram_jax(audio, n_mels)
                windows = mel[:, : n_windows * N_FRAMES].reshape(
                    n_mels, n_windows, N_FRAMES
                )
                windows = jnp.transpose(windows, (1, 0, 2))
                xa = graphs.encode(enc, windows, n_head=n_audio_head)
                return graphs.cross_kv(dec, xa, n_head=n_text_head)

            ck_t, cv_t = one(
                enc_t, dec_t, dims_t.n_mels, dims_t.n_audio_head, dims_t.n_text_head
            )
            ck_d, cv_d = one(
                enc_d, dec_d, dims_d.n_mels, dims_d.n_audio_head, dims_d.n_text_head
            )
            return ck_t, cv_t, ck_d, cv_d

        _SPEC_JITS[key] = jax.jit(frontend)
    return _SPEC_JITS[key]


# ---------------------------------------------------------------------------
# multi-stream batched mel (batch.py's lockstep transcriber)
# ---------------------------------------------------------------------------

_BATCH_MEL_JITS = {}
_WINDOWS_JITS = {}


def batched_device_mel(
    audios: List[np.ndarray], n_mels: int
) -> Tuple[object, List[int]]:
    """N host waveforms -> one device (N, n_mels, F) mel block + per-stream
    content frame counts. One upload and one program regardless of N; every
    stream is padded to a common 30 s bucket (extra digital silence cannot
    change each stream's global max, so all real frames match the host
    log_mel_spectrogram(audio, padding=N_SAMPLES) semantics)."""
    lengths = [np.asarray(a).shape[-1] for a in audios]
    total = max(lengths) + N_SAMPLES
    bucket = -(-total // N_SAMPLES) * N_SAMPLES
    packed = [pack_audio(a, bucket) for a in audios]
    # one int16 stream forced to f32 by another's non-16-bit samples is fine;
    # mixing dtypes in one batch is not
    if any(p.dtype == np.float32 for p in packed):
        stacked = np.stack([p.astype(np.float32) / (32768.0 if p.dtype == np.int16 else 1.0) for p in packed])
    else:
        stacked = np.stack(packed)

    key = (len(audios), bucket, n_mels, stacked.dtype.str)
    if key not in _BATCH_MEL_JITS:
        import jax

        _BATCH_MEL_JITS[key] = jax.jit(partial(log_mel_spectrogram_jax, n_mels=n_mels))
    mel = _BATCH_MEL_JITS[key](stacked)
    return mel, [n // HOP_LENGTH for n in lengths]


def batched_mel_windows(mels, seeks: List[int], segment_sizes: List[int]):
    """Slice one (n_mels, N_FRAMES) window per stream at each stream's seek,
    zero-masking frames >= segment_size (the host pad_or_trim semantic for
    tail windows) — one vmapped device program per round instead of N host
    slices + an upload."""
    import jax
    import jax.numpy as jnp

    B, n_mels, F = mels.shape
    key = (B, n_mels, F)
    if key not in _WINDOWS_JITS:

        def one(mel, seek, size):
            w = jax.lax.dynamic_slice(mel, (0, seek), (n_mels, N_FRAMES))
            return jnp.where(jnp.arange(N_FRAMES)[None, :] < size, w, 0.0)

        _WINDOWS_JITS[key] = jax.jit(jax.vmap(one))
    seeks = jnp.asarray(
        np.minimum(np.asarray(seeks, np.int32), F - N_FRAMES), dtype=jnp.int32
    )
    sizes = jnp.asarray(np.asarray(segment_sizes, np.int32))
    return _WINDOWS_JITS[key](mels, seeks, sizes)
