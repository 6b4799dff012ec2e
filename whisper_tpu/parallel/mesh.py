"""Device-mesh construction for scale-out.

The reference is a single-process single-device stack (SURVEY.md §2b); its
only concurrency is beam batching and heterogeneous ANE/GPU placement. On
TPU, scale-out is expressed as a `jax.sharding.Mesh` over ICI:

  * `dp` — data parallel over audio streams / batched windows (the natural
    axis for this workload: one transcription needs no cross-chip
    communication at all);
  * `tp` — tensor parallel over attention heads / MLP hidden, for models or
    batch sizes where weights or activations should be sharded.

XLA inserts the collectives implied by the sharding annotations
(all-reduce on the tp axis after attention/MLP, gradient psum on dp).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (dp, tp) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
