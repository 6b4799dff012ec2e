"""ctypes bindings for the native runtime library (runtime/audioio.cpp).

This replaces the reference's ctypes -> CoreML bridge pattern
(/root/reference/whisper/coreml.py:19-65) for the host-side pieces that stay
native in a TPU build: audio decode/resample (the ffmpeg-subprocess
equivalent) and fp32<->bf16 buffer conversion. The device compute path is
JAX/XLA and does not go through this library.

The shared library is built by `make -C runtime` (repo root) and looked up
next to this file; if missing, we attempt a one-shot build with g++ so a
fresh checkout works out of the box.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_NAME = "audioio.so"
_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), _LIB_NAME)


def _source_path() -> str:
    return os.path.join(
        os.path.dirname(__file__), os.pardir, os.pardir, "runtime", "audioio.cpp"
    )


def _try_build() -> bool:
    src = os.path.abspath(_source_path())
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o", _lib_path(), src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        path = _lib_path()
        if not os.path.isfile(path) and not _try_build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _lib_failed = True
            return None

        lib.audioio_decode.restype = ctypes.c_int
        lib.audioio_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.audioio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.audioio_last_error.restype = ctypes.c_char_p
        lib.audioio_f32_to_bf16.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64,
        ]
        lib.audioio_bf16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.audioio_log_mel.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.audioio_log_mel.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_audio_native(path: str, sample_rate: int) -> np.ndarray:
    """Decode an audio file to mono float32 at `sample_rate` via the native
    library. Raises RuntimeError with the native error message on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native audioio library unavailable (build with `make -C runtime`)"
        )
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    out_n = ctypes.c_int64(0)
    rc = lib.audioio_decode(
        path.encode("utf-8"), sample_rate, ctypes.byref(out_ptr), ctypes.byref(out_n)
    )
    if rc != 0:
        msg = lib.audioio_last_error().decode("utf-8", errors="replace")
        raise RuntimeError(f"failed to decode audio {path!r}: {msg}")
    try:
        buf = np.ctypeslib.as_array(out_ptr, shape=(out_n.value,))
        return np.array(buf, dtype=np.float32)  # copy out of native buffer
    finally:
        lib.audioio_free(out_ptr)


def log_mel_native(audio: np.ndarray, n_mels: int = 80, padding: int = 0) -> np.ndarray:
    """Native C++ log-mel spectrogram (runtime/audioio.cpp audioio_log_mel):
    same contract as ops/stft.log_mel_spectrogram_np, validated to ~1e-7.
    Exists for pure-native data-loading pipelines; the numpy (pocketfft) path
    is the faster host default."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio library unavailable")
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64(0)
    rc = lib.audioio_log_mel(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.size,
        n_mels,
        padding,
        ctypes.byref(out),
        ctypes.byref(frames),
    )
    if rc != 0:
        msg = lib.audioio_last_error().decode("utf-8", errors="replace")
        raise RuntimeError(f"native log-mel failed: {msg}")
    try:
        buf = np.ctypeslib.as_array(out, shape=(n_mels, frames.value))
        return np.array(buf, dtype=np.float32)
    finally:
        lib.audioio_free(out)


def f32_to_bf16(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even fp32 -> bf16 conversion in native code.
    Returns a uint16 array of the same shape (bf16 bit pattern)."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype=np.uint16)
    if lib is None:
        bits = x.view(np.uint32)
        rounding = np.uint32(0x7FFF) + ((bits >> np.uint32(16)) & np.uint32(1))
        return ((bits + rounding) >> np.uint32(16)).astype(np.uint16)
    lib.audioio_f32_to_bf16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        x.size,
    )
    return out


def bf16_to_f32(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.uint16)
    if lib is None:
        return (x.astype(np.uint32) << np.uint32(16)).view(np.float32)
    out = np.empty(x.shape, dtype=np.float32)
    lib.audioio_bf16_to_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size,
    )
    return out
