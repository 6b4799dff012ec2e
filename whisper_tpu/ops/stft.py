"""Log-mel spectrogram: host (numpy) and on-device (jnp) implementations.

Numerically mirrors the reference pipeline
(/root/reference/whisper/audio.py:110-157): centered Hann-window STFT
(n_fft=400, hop=160, reflect padding), power spectrum with the final frame
dropped, mel projection, log10 with 1e-10 floor, dynamic-range compression to
8 dB below the global max, then (x+4)/4 scaling.

The numpy path is the default for the host orchestrator (a 30 s window costs
~10 ms). The jnp path is jittable and is used by the batched/TPU pipeline and
the multi-stream benchmark; it expresses framing as a strided reshape so XLA
lowers the whole frontend to one fused kernel feeding the rfft.
"""

import numpy as np

from .mel import mel_filterbank

HOP_LENGTH = 160
N_FFT = 400


def _hann_window(n: int) -> np.ndarray:
    # periodic Hann, as used by torch.hann_window(N)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float64)


def log_mel_raw_np(audio: np.ndarray, n_mels: int = 80, padding: int = 0) -> np.ndarray:
    """Unnormalized log10 mel: (n_mels, n_samples//160) float64. The caller
    applies `normalize_log_mel` — split out so a streaming consumer can use
    a stream-global max instead of this chunk's local max."""
    audio = np.asarray(audio, dtype=np.float32)
    if padding > 0:
        audio = np.concatenate([audio, np.zeros(padding, dtype=np.float32)])

    half = N_FFT // 2
    padded = np.pad(audio.astype(np.float64), (half, half), mode="reflect")
    n_frames = 1 + (padded.shape[0] - N_FFT) // HOP_LENGTH
    # strided framing view: (n_frames, N_FFT)
    frames = np.lib.stride_tricks.as_strided(
        padded,
        shape=(n_frames, N_FFT),
        strides=(padded.strides[0] * HOP_LENGTH, padded.strides[0]),
        writeable=False,
    )
    spec = np.fft.rfft(frames * _hann_window(N_FFT), axis=-1)
    magnitudes = np.abs(spec[:-1]) ** 2  # drop the final frame like torch path

    mel = mel_filterbank(n_mels).astype(np.float64) @ magnitudes.T
    return np.log10(np.maximum(mel, 1e-10))


def normalize_log_mel(log_spec: np.ndarray, log_max: float) -> np.ndarray:
    """Whisper's dynamic-range floor + scaling: clamp to (max - 8), then
    (x + 4) / 4. `log_max` is the max over whatever scope defines the clip
    (the whole file in batch; the stream-so-far in streaming)."""
    log_spec = np.maximum(log_spec, log_max - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def log_mel_spectrogram_np(audio: np.ndarray, n_mels: int = 80, padding: int = 0) -> np.ndarray:
    """audio: float32 (n_samples,) at 16 kHz -> (n_mels, n_samples//160) float32."""
    log_spec = log_mel_raw_np(audio, n_mels=n_mels, padding=padding)
    return normalize_log_mel(log_spec, float(log_spec.max()))


def log_mel_spectrogram_jax(audio, n_mels: int = 80):
    """Jittable log-mel for a fixed-length audio array (shape must be static).

    audio: (n_samples,) or (batch, n_samples) float32 — or int16, converted
    on device as i/32768 (the s16 PCM decode semantic, audio.py/audioio.cpp):
    shipping int16 over a remote-PJRT link halves the largest host->device
    transfer of the pipeline, and for audio that came from 16-bit sources
    the float path is bit-identical. n_samples % 160 == 0.
    Returns (..., n_mels, n_samples//160) float32.
    """
    import jax
    import jax.numpy as jnp

    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    single = audio.ndim == 1
    if single:
        audio = audio[None]
    b, n = audio.shape
    assert n % HOP_LENGTH == 0, "audio length must be a multiple of the hop"

    half = N_FFT // 2
    # reflect padding
    left = audio[:, 1 : half + 1][:, ::-1]
    right = audio[:, -half - 1 : -1][:, ::-1]
    padded = jnp.concatenate([left, audio, right], axis=1)

    # STFT as a strided CONVOLUTION with the windowed real-DFT basis as 402
    # output channels (cos+sin): out[b, f, t] = sum_n padded[t*160+n] * W[f, n].
    # Length-400 FFTs lower poorly on TPU, and the obvious alternative — an
    # explicit framing gather feeding a matmul — spends ~24 ms on the 3.6M
    # gather indices for 90 s of audio; the conv expresses the same math with
    # no materialized frames and rides the MXU (measured sub-ms). 'highest'
    # precision keeps f32 accuracy on the bf16-MXU default path.
    window = _hann_window(N_FFT)
    F = N_FFT // 2 + 1
    k = np.arange(N_FFT)[:, None] * np.arange(F)[None, :]
    ang = -2.0 * np.pi * k / N_FFT
    basis = np.concatenate(
        [(np.cos(ang) * window[:, None]).T, (np.sin(ang) * window[:, None]).T]
    ).astype(np.float32)  # (2F, N_FFT)
    spec = jax.lax.conv_general_dilated(
        padded[:, None, :],
        jnp.asarray(basis)[:, None, :],
        (HOP_LENGTH,),
        "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, :, :-1]  # (b, 2F, n//160); final frame dropped like the torch path
    magnitudes = spec[:, :F] ** 2 + spec[:, F:] ** 2  # (b, 201, n//160)

    filters = jnp.asarray(mel_filterbank(n_mels))  # (n_mels, 201)
    mel = jnp.einsum("mf,bft->bmt", filters, magnitudes, precision="highest")

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    global_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, global_max - 8.0)
    out = (log_spec + 4.0) / 4.0
    return out[0] if single else out


# ---- device-resident full-file mel for the orchestrator ---------------------
#
# transcribe() historically computed the whole-file mel on the host and
# shipped a (n_mels, 3000) float32 window to the device per decode — ~1.5 MB
# per window, a full tunnel round trip each under remote PJRT. The device
# path computes the mel once on the TPU (MXU DFT matmul) and slices windows
# with a tiny jitted dynamic_slice, so window features never touch the host.
#
# Audio is zero-padded up to a 30 s multiple so the mel jit compiles once per
# length BUCKET (ceil(len/30 s)), not once per file length; extra zero
# samples cannot change the global max used for dynamic-range compression
# (digital silence maps to the log floor) and all real frames are identical.

_CHUNK_SAMPLES = 30 * 16000


def device_mel_full(audio, n_mels: int):
    """audio: float32 (n,) host waveform -> (device mel (n_mels, F),
    content_frames). The mel includes the standard 30 s of zero padding on
    top of the bucket padding; content_frames is derived from the TRUE
    length (== host log_mel_spectrogram(audio, padding=N_SAMPLES) semantics)."""
    audio = np.asarray(audio, dtype=np.float32)
    n = audio.shape[-1]
    total = n + _CHUNK_SAMPLES
    bucket = -(-total // _CHUNK_SAMPLES) * _CHUNK_SAMPLES
    # 16-bit-sourced audio (the common case: s16 PCM decode, no resample)
    # uploads as int16 — half the bytes over the tunnel, bit-identical mel
    # (the device converts as i/32768, exactly the decoder's semantic)
    scaled = audio * 32768.0
    if np.all(np.abs(scaled) <= 32767) and np.array_equal(
        scaled, np.round(scaled)
    ):
        padded = np.zeros(bucket, dtype=np.int16)
        padded[:n] = scaled.astype(np.int16)
    else:
        padded = np.zeros(bucket, dtype=np.float32)
        padded[:n] = audio
    mel = _mel_jit(n_mels)(padded)
    return mel, n // HOP_LENGTH


_MEL_JITS = {}


def _mel_jit(n_mels: int):
    if n_mels not in _MEL_JITS:
        import jax

        _MEL_JITS[n_mels] = jax.jit(lambda a: log_mel_spectrogram_jax(a, n_mels))
    return _MEL_JITS[n_mels]


_WINDOW_JIT = None


def device_mel_window(mel, seek: int, segment_size: int):
    """Slice a (n_mels, N_FRAMES) window at frame `seek` on device, zeroing
    frames >= segment_size (the host path's explicit zero pad_or_trim of the
    tail window, reference transcribe.py:287-297)."""
    global _WINDOW_JIT
    if _WINDOW_JIT is None:
        import jax
        import jax.numpy as jnp

        def _win(mel, seek, segment_size, n_frames=_CHUNK_SAMPLES // HOP_LENGTH):
            win = jax.lax.dynamic_slice(mel, (0, seek), (mel.shape[0], n_frames))
            mask = jnp.arange(n_frames)[None, :] < segment_size
            return jnp.where(mask, win, 0.0)

        _WINDOW_JIT = jax.jit(_win)
    import jax.numpy as jnp

    return _WINDOW_JIT(mel, jnp.int32(seek), jnp.int32(segment_size))


# ---- batched round windows for the continuous batcher -----------------------

_WINDOW_BATCH_JITS = {}
_ZERO_MELS = {}


def _zero_mel(n_mels: int, frames: int):
    """Cached device zeros standing in for idle/other-bucket slots inside a
    bucket's window program (a zero mel slices to a zero window)."""
    key = (n_mels, frames)
    if key not in _ZERO_MELS:
        import jax.numpy as jnp

        _ZERO_MELS[key] = jnp.zeros((n_mels, frames), jnp.float32)
    return _ZERO_MELS[key]


def _window_batch_jit(slots: int, n_mels: int, frames: int, with_acc: bool):
    """One program slicing EVERY slot's window for one mel-length bucket:
    `slots` dynamic_slices + tail masks, stacked to (slots, n_mels, 3000).
    Keys on (slots, bucket length) — a handful of compiles ever, vs one
    dispatch per occupied slot per round (16 dispatches/round at slots=16,
    the r3 known-minor this replaces). The `with_acc` variant folds the
    cross-bucket combine INTO the program (donated accumulator), so a round
    costs exactly one dispatch per length bucket — never more than the
    per-slot scheme even when every occupied slot has a distinct length."""
    key = (slots, n_mels, frames, with_acc)
    if key not in _WINDOW_BATCH_JITS:
        import jax
        import jax.numpy as jnp

        n_frames = _CHUNK_SAMPLES // HOP_LENGTH

        def _wins(mels, seeks, sizes, acc=None):
            cols = jnp.arange(n_frames)[None, :]
            rows = []
            for i, mel in enumerate(mels):
                win = jax.lax.dynamic_slice(
                    mel, (0, seeks[i]), (mel.shape[0], n_frames)
                )
                rows.append(jnp.where(cols < sizes[i], win, 0.0))
            stacked = jnp.stack(rows)
            return stacked if acc is None else acc + stacked

        _WINDOW_BATCH_JITS[key] = (
            jax.jit(_wins, donate_argnums=(3,))  # acc is round-local
            if with_acc
            else jax.jit(lambda mels, seeks, sizes: _wins(mels, seeks, sizes))
        )
    return _WINDOW_BATCH_JITS[key]


def device_mel_round_windows(slot_mels, seeks, sizes, n_mels: int):
    """Build one lockstep round's (slots, n_mels, N_FRAMES) window stack from
    per-slot device mels in exactly (#length-buckets) device programs.
    `slot_mels[i]` is the slot's full device mel (n_mels, F_i) or None when
    the slot is idle; idle slots come back as zero windows (the semantics
    the decode path already expects for padding slots).

    Slots sharing a mel-length bucket ride ONE program (zero mels fill the
    other positions — sliced+masked they contribute exact zeros), and
    multi-bucket rounds combine inside the bucket programs themselves: each
    subsequent program adds its stack onto the (donated) accumulator, so the
    dispatch count is #buckets <= #occupied-slots at any bucket diversity."""
    import jax.numpy as jnp

    slots = len(slot_mels)
    n_frames = _CHUNK_SAMPLES // HOP_LENGTH
    buckets = {}
    for i, mel in enumerate(slot_mels):
        if mel is not None:
            buckets.setdefault(int(mel.shape[-1]), []).append(i)
    if not buckets:
        return jnp.zeros((slots, n_mels, n_frames), jnp.float32)

    total = None
    for frames, members in sorted(buckets.items()):
        member_set = set(members)
        mels, bseeks, bsizes = [], [], []
        for i in range(slots):
            if i in member_set:
                mels.append(slot_mels[i])
                bseeks.append(seeks[i])
                bsizes.append(sizes[i])
            else:
                mels.append(_zero_mel(n_mels, frames))
                bseeks.append(0)
                bsizes.append(0)
        args = (
            tuple(mels),
            jnp.asarray(bseeks, jnp.int32),
            jnp.asarray(bsizes, jnp.int32),
        )
        if total is None:
            total = _window_batch_jit(slots, n_mels, frames, False)(*args)
        else:
            total = _window_batch_jit(slots, n_mels, frames, True)(*args, total)
    return total
