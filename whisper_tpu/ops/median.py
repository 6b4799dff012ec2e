"""Median filter over the last axis (odd width, reflect padding).

The reference uses a templated Triton bubble-sort kernel on CUDA and a
torch unfold+sort fallback (/root/reference/whisper/timing.py:19-54,
triton_ops.py:43-109). The numpy path mirrors the unfold+sort semantics; the
jnp path expresses the sliding window as a stack of rolls + `jnp.sort`, which
XLA fuses into one vectorized kernel (width is small and static — 7 by
default)."""

import numpy as np


def median_filter_np(x: np.ndarray, filter_width: int) -> np.ndarray:
    """x: (..., T) -> same shape, median over a reflect-padded window."""
    pad = filter_width // 2
    if x.shape[-1] <= pad:
        return x
    assert filter_width > 0 and filter_width % 2 == 1, "`filter_width` should be odd"

    padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(padded, filter_width, axis=-1)
    return np.sort(windows, axis=-1)[..., pad]


def median_filter_jax(x, filter_width: int):
    """Jittable median filter; x: (..., T)."""
    import jax.numpy as jnp

    pad = filter_width // 2
    if x.shape[-1] <= pad:
        return x
    assert filter_width > 0 and filter_width % 2 == 1, "`filter_width` should be odd"

    left = x[..., 1 : pad + 1][..., ::-1]
    right = x[..., -pad - 1 : -1][..., ::-1]
    padded = jnp.concatenate([left, x, right], axis=-1)

    windows = jnp.stack(
        [padded[..., k : k + x.shape[-1]] for k in range(filter_width)], axis=-1
    )
    return jnp.sort(windows, axis=-1)[..., pad]
