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
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a mesh over the given (default: all) devices with the axes
    that are > 1: always (dp, tp), plus `pp` (pipeline stages) and/or `sp`
    (sequence/frame sharding, parallel/sequence.py) when requested.

    Axis order puts `tp` innermost (the tightest-coupled chips carry the
    per-layer all-reduces), `sp` next (per-layer K/V all-gathers), `pp`
    next (stage-to-stage ppermute hops), `dp` outermost (no communication
    inside one decode at all). The 2-axis form is kept when pp == sp == 1
    so existing (dp, tp) consumers see an unchanged mesh shape."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (tp * pp * sp) == 0, (
            f"{n} devices not divisible by tp*pp*sp={tp * pp * sp}"
        )
        dp = n // (tp * pp * sp)
    assert dp * tp * pp * sp == n, (
        f"mesh dp{dp}*pp{pp}*sp{sp}*tp{tp} != {n} devices"
    )
    shape = [("dp", dp)]
    if pp > 1:
        shape.append(("pp", pp))
    if sp > 1:
        shape.append(("sp", sp))
    shape.append(("tp", tp))
    names, sizes = zip(*shape)
    return Mesh(np.array(devices).reshape(*sizes), axis_names=names)
