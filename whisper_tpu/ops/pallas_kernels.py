"""Pallas TPU kernels for the word-timing hot ops.

The reference implements these as Triton CUDA kernels
(/root/reference/whisper/triton_ops.py): an anti-diagonal wavefront DTW
(dtw_kernel, :13-40) and a source-templated bubble-sort median filter
(median_kernel, :43-95). These are the Pallas equivalents:

  * `dtw_trace_pallas` — single-program kernel; VMEM-resident cost
    diagonals relaxed with a fori_loop wavefront (one VPU op per diagonal,
    mirroring the Triton block-wide sweep with debug_barrier per diagonal);
    emits the full trace matrix, backtraced on the host exactly like the
    reference CUDA path (timing.py:138).
  * `median_filter_pallas` — width-templated compare-exchange network over
    `width` shifted copies of each row block; odd-even transposition sort
    (the parallel analog of the Triton bubble sort) then the middle element.

Both kernels fall back to interpret mode off-TPU, and ops/dtw.py /
ops/median.py remain the default paths; these kernels are selected via
`WHISPER_TPU_PALLAS=1` or the `use_pallas=True` arguments.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# DTW wavefront
# ---------------------------------------------------------------------------


def _dtw_kernel(x_ref, trace_ref, cost2_ref, cost1_ref):
    """x: (N+1, M+1) cost matrix padded with +inf row/col 0 (x[i,j] holds
    x_orig[i-1, j-1]); trace out: (N+1, M+1) int32. Scratch cost2/cost1 hold
    the cost diagonals d-2 / d-1 as column vectors indexed by i."""
    from jax.experimental import pallas as pl

    n_rows = x_ref.shape[0]  # N+1
    n_cols = x_ref.shape[1]  # M+1
    INF = jnp.float32(np.inf)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)

    # init: diagonal 0 = {cost[0,0]=0}; diagonal 1 all inf
    cost2_ref[:] = jnp.where(rows == 0, 0.0, INF)
    cost1_ref[:] = jnp.full((n_rows, 1), INF, dtype=jnp.float32)
    trace_ref[:] = jnp.full((n_rows, n_cols), -1, dtype=jnp.int32)

    def relax(d, _):
        prev2 = cost2_ref[:]  # (n_rows, 1) cost on diagonal d-2
        prev1 = cost1_ref[:]  # cost on diagonal d-1
        j = d - rows  # column of each row's cell on diagonal d
        valid = (rows >= 1) & (j >= 1) & (j <= n_cols - 1)

        shift = jnp.concatenate([jnp.full((1, 1), INF), prev2[:-1]], axis=0)
        c0 = shift  # cost[i-1, j-1]
        c1 = jnp.concatenate([jnp.full((1, 1), INF), prev1[:-1]], axis=0)  # cost[i-1, j]
        c2 = prev1  # cost[i, j-1]

        take0 = (c0 < c1) & (c0 < c2)
        take1 = (c1 < c0) & (c1 < c2) & ~take0
        c = jnp.where(take0, c0, jnp.where(take1, c1, c2))
        t = jnp.where(take0, 0, jnp.where(take1, 1, 2)).astype(jnp.int32)

        # gather x[i, j] along the diagonal: one element per row
        cols = jnp.clip(j, 0, n_cols - 1)
        xvals = jnp.take_along_axis(x_ref[:], cols, axis=1)  # (n_rows, 1)

        cur = jnp.where(valid, xvals + c, INF)

        # scatter the trace entries of this diagonal
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 1) == cols
        ) & valid
        trace_ref[:] = jnp.where(onehot, t, trace_ref[:])

        cost2_ref[:] = prev1
        cost1_ref[:] = cur
        return ()

    jax.lax.fori_loop(2, n_rows + n_cols - 1, relax, ())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dtw_trace_call(x_padded, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, n_cols = x_padded.shape
    return pl.pallas_call(
        _dtw_kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_rows, 1), jnp.float32),
            pltpu.VMEM((n_rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x_padded)


def dtw_trace_pallas(x: np.ndarray, interpret=None) -> np.ndarray:
    """x: (N, M) float cost matrix -> (N+1, M+1) int32 trace table."""
    if interpret is None:
        interpret = not _on_tpu()
    x_padded = np.full((x.shape[0] + 1, x.shape[1] + 1), np.inf, dtype=np.float32)
    x_padded[1:, 1:] = x
    return np.asarray(_dtw_trace_call(jnp.asarray(x_padded), interpret=interpret))


def dtw_pallas(x: np.ndarray, interpret=None) -> np.ndarray:
    """Full DTW path via the Pallas wavefront + host backtrace."""
    from .dtw import backtrace

    trace = dtw_trace_pallas(np.asarray(x, dtype=np.float32), interpret=interpret)
    return backtrace(trace.astype(np.int32))


# ---------------------------------------------------------------------------
# Median filter
# ---------------------------------------------------------------------------


def _median_kernel(x_ref, out_ref, *, width: int, T: int):
    """x: (rows, T + width - 1) reflect-padded rows; out: (rows, T).
    Odd-even transposition sort over the `width` shifted row copies."""
    lanes = [x_ref[:, k : k + T] for k in range(width)]

    # odd-even transposition network: `width` passes guarantee sortedness
    for p in range(width):
        start = p % 2
        for i in range(start, width - 1, 2):
            lo = jnp.minimum(lanes[i], lanes[i + 1])
            hi = jnp.maximum(lanes[i], lanes[i + 1])
            lanes[i], lanes[i + 1] = lo, hi

    out_ref[:] = lanes[width // 2]


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def _median_call(x_padded, width, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, padded_T = x_padded.shape
    T = padded_T - (width - 1)
    kernel = functools.partial(_median_kernel, width=width, T=T)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, T), x_padded.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_padded)


def median_filter_pallas(x: np.ndarray, filter_width: int, interpret=None) -> np.ndarray:
    """Median filter over the last axis with reflect padding; any leading
    dims. Matches ops/median.py numerics."""
    assert filter_width > 0 and filter_width % 2 == 1, "`filter_width` should be odd"
    if interpret is None:
        interpret = not _on_tpu()
    x = np.asarray(x)
    pad = filter_width // 2
    if x.shape[-1] <= pad:
        return x
    lead = x.shape[:-1]
    T = x.shape[-1]
    flat = x.reshape(-1, T)
    padded = np.pad(flat, ((0, 0), (pad, pad)), mode="reflect")
    out = _median_call(jnp.asarray(padded), filter_width, interpret=interpret)
    return np.asarray(out).reshape(*lead, T)
