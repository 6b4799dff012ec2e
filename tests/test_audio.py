"""Audio frontend tests, mirroring the reference contract
(/root/reference/tests/test_audio.py) plus native-decoder checks."""

import ctypes
import hashlib
import os.path

import numpy as np
import pytest

from whisper_tpu.audio import SAMPLE_RATE, load_audio, log_mel_spectrogram, pad_or_trim

from conftest import JFK


def test_load_audio_jfk(jfk_audio):
    audio = jfk_audio
    assert audio.ndim == 1
    assert SAMPLE_RATE * 10 < audio.shape[0] < SAMPLE_RATE * 12
    assert 0 < audio.std() < 1


def test_flac_decode_matches_streaminfo_md5():
    """The native FLAC decoder's raw output must hash to the MD5 embedded in
    the stream's STREAMINFO block — a bit-exactness check."""
    from whisper_tpu.runtime.native import _load

    lib = _load()
    assert lib is not None, "native audioio library unavailable"
    lib.audioio_decode_raw.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p,
    ]
    p = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    bps = ctypes.c_int()
    md5 = ctypes.create_string_buffer(16)
    rc = lib.audioio_decode_raw(
        JFK.encode(),
        ctypes.byref(p),
        ctypes.byref(n),
        ctypes.byref(ch),
        ctypes.byref(sr),
        ctypes.byref(bps),
        md5,
    )
    assert rc == 0
    arr = np.ctypeslib.as_array(p, shape=(n.value,)).copy()
    lib.audioio_free_i32(p)

    nbytes = bps.value // 8
    packed = arr.astype("<i4").view(np.uint8).reshape(-1, 4)[:, :nbytes].tobytes()
    assert hashlib.md5(packed).hexdigest() == md5.raw.hex()
    assert (sr.value, ch.value, bps.value) == (44100, 2, 24)


def test_mel_from_file_equals_mel_from_audio(jfk_audio):
    mel_from_file = log_mel_spectrogram(JFK)
    mel_from_audio = log_mel_spectrogram(jfk_audio)
    assert np.allclose(mel_from_file, mel_from_audio)
    assert mel_from_file.max() - mel_from_file.min() <= 2.0


def test_mel_matches_torch_reference(jfk_audio):
    """Our numpy STFT+mel path vs the reference torch pipeline."""
    torch = pytest.importorskip("torch")
    from whisper_tpu.ops.mel import mel_filterbank

    mine = log_mel_spectrogram(jfk_audio, 80)

    at = torch.from_numpy(jfk_audio)
    window = torch.hann_window(400)
    stft = torch.stft(at, 400, 160, window=window, return_complex=True)
    mags = stft[..., :-1].abs() ** 2
    mel_spec = torch.from_numpy(mel_filterbank(80)) @ mags
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    ref = ((log_spec + 4.0) / 4.0).numpy()

    assert mine.shape == ref.shape
    assert np.abs(mine - ref).max() < 5e-5


def test_mel_filterbank_matches_reference_asset():
    """Our formula-generated filterbank vs the reference's precomputed npz."""
    from conftest import HAS_REFERENCE

    asset = "/root/reference/whisper/assets/mel_filters.npz"
    if not (HAS_REFERENCE and os.path.isfile(asset)):
        pytest.skip("reference asset unavailable")
    from whisper_tpu.ops.mel import mel_filterbank

    with np.load(asset) as f:
        for n in (80, 128):
            assert np.abs(mel_filterbank(n) - f[f"mel_{n}"]).max() < 1e-7


def test_jax_mel_matches_numpy(jfk_audio):
    from whisper_tpu.ops.stft import log_mel_spectrogram_jax

    n = (len(jfk_audio) // 160) * 160
    audio = jfk_audio[:n]
    jx = np.asarray(log_mel_spectrogram_jax(audio, 80))
    ref = log_mel_spectrogram(audio, 80)
    assert jx.shape == ref.shape
    assert np.abs(jx - ref).max() < 5e-3  # f32 rfft vs f64


def _s16_waveform(n=160 * 600, seed=3):
    """An int16 waveform and its exact float32 decode (i/32768). Note
    jfk.flac does NOT qualify: the native decoder resamples it, producing
    arbitrary floats — the int16 fast path applies to unresampled 16-bit
    sources."""
    i16 = (np.random.RandomState(seed).randn(n) * 8000).astype(np.int16)
    return i16, i16.astype(np.float32) / 32768.0


def test_jax_mel_int16_bit_identical():
    """int16 upload path: device converts as i/32768, so 16-bit-sourced
    audio must produce a BIT-IDENTICAL mel to the float32 path (the win is
    halving the largest host->device transfer, not changing numerics)."""
    import jax.numpy as jnp

    from whisper_tpu.ops.stft import log_mel_spectrogram_jax

    i16, audio = _s16_waveform()
    f32_mel = np.asarray(log_mel_spectrogram_jax(audio, 80))
    i16_mel = np.asarray(log_mel_spectrogram_jax(jnp.asarray(i16), 80))
    assert np.array_equal(f32_mel, i16_mel)


def test_device_mel_full_picks_int16():
    """device_mel_full auto-detects int16-representable waveforms; the
    fast path must equal the float path bit for bit on the same samples."""
    from whisper_tpu.ops import stft

    _, audio = _s16_waveform()
    mel_auto, frames = stft.device_mel_full(audio, 80)  # int16 fast path
    # force the float32 path by making one sample non-representable; the
    # mel is then compared on the unaffected tail frames
    nudged = audio.copy()
    nudged[0] += 2.0**-20
    mel_f32, frames2 = stft.device_mel_full(nudged, 80)
    assert frames == frames2
    a, b = np.asarray(mel_auto), np.asarray(mel_f32)
    assert a.shape == b.shape
    assert np.abs(a[:, 10:] - b[:, 10:]).max() < 1e-5


def test_pad_or_trim():
    x = np.ones(1000, dtype=np.float32)
    assert pad_or_trim(x, 480000).shape == (480000,)
    assert pad_or_trim(np.ones(500000), 480000).shape == (480000,)
    m = np.ones((80, 100))
    assert pad_or_trim(m, 3000).shape == (80, 3000)


def test_decode_error_messages(tmp_path):
    with pytest.raises(RuntimeError, match="cannot open file"):
        load_audio(str(tmp_path / "missing.flac"))
    bad = tmp_path / "garbage.bin"
    bad.write_bytes(b"\x01\x02" * 100)
    with pytest.raises(RuntimeError, match="unrecognized container"):
        load_audio(str(bad))


def test_wav_decode_roundtrip(tmp_path):
    """Write a PCM16 WAV with the stdlib and decode it natively."""
    import wave

    sr = 16000
    t = np.arange(sr) / sr
    signal = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    path = tmp_path / "tone.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(signal.tobytes())

    audio = load_audio(str(path))
    assert audio.shape == (sr,)
    assert np.abs(audio - signal.astype(np.float32) / 32768.0).max() < 1e-6


def test_native_log_mel_matches_numpy(jfk_audio):
    """C++ audioio_log_mel vs the numpy reference path."""
    from whisper_tpu.ops.stft import log_mel_spectrogram_np
    from whisper_tpu.runtime import log_mel_native

    for n_mels, padding in [(80, 0), (128, 48000)]:
        native = log_mel_native(jfk_audio, n_mels=n_mels, padding=padding)
        ref = log_mel_spectrogram_np(jfk_audio, n_mels=n_mels, padding=padding)
        assert native.shape == ref.shape
        assert np.abs(native - ref).max() < 1e-5
