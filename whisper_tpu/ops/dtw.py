"""Dynamic time warping for word-timestamp alignment.

The reference ships three DTW backends: a numba-JIT CPU loop
(/root/reference/whisper/timing.py:82-105), a Triton anti-diagonal wavefront
CUDA kernel (triton_ops.py:13-40), and a shared host backtrace. Here:

  * `dtw_np`   — numpy CPU path, vectorized over anti-diagonals (no numba
                 dependency), bit-identical decision rule;
  * `dtw_jax`  — on-device `lax.scan` over anti-diagonals producing the same
                 trace matrix; the O(N+M) sequential dependence is inherent to
                 DTW, each scan step is one fused VPU op over a diagonal;
  * `backtrace`— host walk of the trace matrix (as the reference does for the
                 CUDA path too, timing.py:138).

The decision rule replicates the reference exactly, including its tie
behavior (when diag and up costs tie, "left" is chosen — the numba code's
if/elif/else falls through to c2).
"""

import numpy as np


def backtrace(trace: np.ndarray) -> np.ndarray:
    """trace: (N+1, M+1) int in {0 diag, 1 up, 2 left}. Returns (2, K) path
    indices over the (N, M) cost matrix."""
    i = trace.shape[0] - 1
    j = trace.shape[1] - 1
    trace = trace.copy()
    trace[0, :] = 2
    trace[:, 0] = 1

    result = []
    while i > 0 or j > 0:
        result.append((i - 1, j - 1))
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        elif t == 2:
            j -= 1
        else:
            raise ValueError("Unexpected trace[i, j]")
    result = np.array(result)
    return result[::-1, :].T


def _dtw_table_np(x: np.ndarray) -> np.ndarray:
    """Fill the DTW trace table on the CPU, one anti-diagonal at a time."""
    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    trace = -np.ones((N + 1, M + 1), dtype=np.int8)
    cost[0, 0] = 0.0

    # cells on anti-diagonal d satisfy i + j == d, i in [max(1, d-M), min(N, d-1)]
    for d in range(2, N + M + 1):
        i_lo = max(1, d - M)
        i_hi = min(N, d - 1)
        if i_lo > i_hi:
            continue
        i = np.arange(i_lo, i_hi + 1)
        j = d - i
        c0 = cost[i - 1, j - 1]  # diag
        c1 = cost[i - 1, j]  # up
        c2 = cost[i, j - 1]  # left
        take0 = (c0 < c1) & (c0 < c2)
        take1 = (c1 < c0) & (c1 < c2) & ~take0
        c = np.where(take0, c0, np.where(take1, c1, c2))
        t = np.where(take0, 0, np.where(take1, 1, 2)).astype(np.int8)
        cost[i, j] = x[i - 1, j - 1] + c
        trace[i, j] = t
    return trace


def dtw_np(x: np.ndarray) -> np.ndarray:
    """x: (N, M) cost matrix -> (2, K) alignment path (text idx, time idx)."""
    return backtrace(_dtw_table_np(np.asarray(x, dtype=np.float64)))


def _dtw_trace_jax(x):
    """Device DTW table fill. x: (N, M) f32. Returns trace (N+1, M+1) i32.

    State is carried as three skewed diagonal buffers of length N+1; each scan
    step relaxes one anti-diagonal (cf. the reference Triton wavefront,
    triton_ops.py:13-40).
    """
    import jax
    import jax.numpy as jnp

    N, M = x.shape
    INF = jnp.float32(np.inf)

    # pad x to (N+1) rows indexed by i-1
    xp = jnp.pad(x.astype(jnp.float32), ((1, 0), (1, 0)), constant_values=np.inf)

    rows = jnp.arange(N + 1)

    def step(carry, d):
        prev2, prev1 = carry  # cost diagonals d-2 and d-1, indexed by i
        j = d - rows  # column for each row on diagonal d
        valid = (rows >= 1) & (rows <= N) & (j >= 1) & (j <= M)

        c0 = jnp.roll(prev2, 1)  # cost[i-1, j-1]
        c1 = jnp.roll(prev1, 1)  # cost[i-1, j]
        c2 = prev1  # cost[i, j-1]

        take0 = (c0 < c1) & (c0 < c2)
        take1 = (c1 < c0) & (c1 < c2) & ~take0
        c = jnp.where(take0, c0, jnp.where(take1, c1, c2))
        t = jnp.where(take0, 0, jnp.where(take1, 1, 2)).astype(jnp.int8)

        xval = xp[rows, jnp.clip(j, 0, M)]
        cur = jnp.where(valid, xval + c, INF)
        # seed: cost[0,0] = 0 lives on diagonal 0 (handled by init)
        t = jnp.where(valid, t, -1)
        return (prev1, cur), t

    init0 = jnp.full((N + 1,), np.inf, dtype=jnp.float32).at[0].set(0.0)  # d=0
    init1 = jnp.full((N + 1,), np.inf, dtype=jnp.float32)  # d=1: cost[0,1]=inf, cost[1,0]=inf
    (_, _), traces = jax.lax.scan(step, (init0, init1), jnp.arange(2, N + M + 1))

    # scatter diagonals back into the (N+1, M+1) trace matrix
    trace = jnp.full((N + 1, M + 1), -1, dtype=jnp.int8)
    ds = jnp.arange(2, N + M + 1)
    ii = jnp.broadcast_to(rows[None, :], traces.shape)
    jj = ds[:, None] - ii
    valid = (ii >= 1) & (ii <= N) & (jj >= 1) & (jj <= M)
    trace = trace.at[
        jnp.where(valid, ii, 0), jnp.where(valid, jj, 0)
    ].set(jnp.where(valid, traces, trace[0, 0]))
    return trace


def dtw_jax(x) -> np.ndarray:
    """Device DTW + host backtrace. x: (N, M) array-like."""
    import jax

    x = np.asarray(x, dtype=np.float32)
    trace = np.asarray(jax.jit(_dtw_trace_jax)(x), dtype=np.int8)
    return backtrace(trace.astype(np.int32))


def dtw(x, prefer_device: bool = False) -> np.ndarray:
    """DTW alignment path of a cost matrix. Matches the reference
    `dtw(-matrix)` contract (timing.py:141-151)."""
    if prefer_device:
        return dtw_jax(x)
    return dtw_np(np.asarray(x))
