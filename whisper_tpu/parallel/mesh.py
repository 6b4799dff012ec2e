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
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (dp, tp) — or, with pp > 1, (dp, pp, tp) — mesh over the
    given (default: all) devices.

    Axis order puts `tp` innermost (the tightest-coupled chips carry the
    per-layer all-reduces), `pp` next (stage-to-stage ppermute hops), `dp`
    outermost (no communication inside one decode at all). The 2-axis form
    is kept when pp == 1 so existing (dp, tp) consumers see an unchanged
    mesh shape."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (tp * pp) == 0, f"{n} devices not divisible by tp*pp={tp * pp}"
        dp = n // (tp * pp)
    assert dp * tp * pp == n, f"mesh dp{dp}*pp{pp}*tp{tp} != {n} devices"
    if pp == 1:
        return Mesh(np.array(devices).reshape(dp, tp), axis_names=("dp", "tp"))
    return Mesh(
        np.array(devices).reshape(dp, pp, tp), axis_names=("dp", "pp", "tp")
    )
