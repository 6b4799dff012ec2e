#!/usr/bin/env python
"""Measure whether int4 weight-only dots beat int8 on the TPU decode-step
weight sweep (the bandwidth-bound regime: tiny activation batch, full weight
read per step).

int8 per-channel already runs 1.61x over bf16 because XLA fuses the s8->bf16
convert into the dot's HBM read (quant.py). int4 halves the bytes again but
needs per-block scales for accuracy (groupwise s4 recipe); the dot becomes a
two-einsum contraction (block-partial matmul + scale reduce). This probe
times all three forms on a turbo-decoder-shaped weight sweep to decide if an
int4 mode is worth shipping. Run on the live chip:

    python tools/int4_probe.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("WHISPER_TPU_CACHE_DIR", os.path.join(REPO, ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

D = 1280
B = 10  # beam-5 x 2 audios
N_MATS = 16  # proxy for the per-step decoder weight sweep (4 layers x 4 dots)
BLOCK = 64
ITERS = 200


def timed(fn, *args):
    fn(*args)  # compile + warm
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0][0])  # force a transfer sync
    t1 = time.perf_counter()
    return (t1 - t0) * 1e3


def main():
    rng = np.random.default_rng(0)
    ws = [rng.standard_normal((D, 4 * D)).astype(np.float32) for _ in range(N_MATS)]
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)

    w_bf16 = [jnp.asarray(w, jnp.bfloat16) for w in ws]

    def q8(w):
        s = np.abs(w).max(axis=0) / 127.0 + 1e-12
        return jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8), jnp.asarray(s, jnp.float32)

    def q4(w, block):
        """Nibble-PACKED int4: two 4-bit values per int8 byte along K.

        Native jnp.int4 arrays cannot cross a jit boundary on the axon
        plugin (device_put of an S4 array recurses; host<->S4 transfers are
        UNIMPLEMENTED), so persistent int4 weights must ride an int8
        carrier and unpack inside the program."""
        K, N = w.shape
        kb = K // block
        wb = w.reshape(kb, block, N)
        s = np.abs(wb).max(axis=1) / 7.0 + 1e-12  # (kb, N)
        wi = np.clip(np.round(wb / s[:, None, :]), -7, 7).astype(np.int8).reshape(K, N)
        pair = wi.reshape(K // 2, 2, N)
        packed = ((pair[:, 0] & 0x0F) | ((pair[:, 1] & 0x0F) << 4)).astype(np.int8)
        return jnp.asarray(packed), jnp.asarray(s, jnp.float32)

    def unpack4(p):
        # sign-extended nibbles via arithmetic shifts on int8
        lo = jnp.right_shift(jnp.left_shift(p, 4), 4)  # (K/2, N)
        hi = jnp.right_shift(p, 4)
        return jnp.stack([lo, hi], axis=1).reshape(p.shape[0] * 2, p.shape[1])

    w_i8 = [q8(w) for w in ws]
    w_i4 = [q4(w, BLOCK) for w in ws]

    @jax.jit
    def sweep_bf16(x, ws):
        acc = jnp.zeros((B, 4 * D), jnp.float32)
        for w in ws:
            acc = acc + jnp.dot(x, w, preferred_element_type=jnp.float32)
        return acc

    @jax.jit
    def sweep_i8(x, ws):
        acc = jnp.zeros((B, 4 * D), jnp.float32)
        for w, s in ws:
            y = jnp.dot(x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            acc = acc + y * s
        return acc

    def sweep_i4(x, ws):
        acc = jnp.zeros((B, 4 * D), jnp.float32)
        kb = D // BLOCK
        xb = x.reshape(B, kb, BLOCK)
        for p, s in ws:
            wb = unpack4(p).reshape(kb, BLOCK, 4 * D).astype(jnp.bfloat16)
            part = jnp.einsum(
                "bkg,kgn->bkn", xb, wb, preferred_element_type=jnp.float32
            )
            acc = acc + jnp.einsum("bkn,kn->bn", part, s)
        return acc

    def sweep_i4_flat(x, ws):
        # block scale applied per x-block OUTSIDE the weight read: requires
        # folding scales into activations — approximate shape-wise probe of
        # "unpack + one flat dot" (bandwidth identical to sweep_i4)
        acc = jnp.zeros((B, 4 * D), jnp.float32)
        for p, s in ws:
            y = jnp.dot(
                x, unpack4(p).astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
            acc = acc + y * s[0]
        return acc

    # loop ITERS inside one device program to amortize the tunnel RTT;
    # weights ride as jit ARGUMENTS (closure constants would make JAX pull
    # int4 values to host for MLIR constants — unimplemented on this plugin)
    def loop(fn):
        @jax.jit
        def run(x, ws):
            def body(i, a):
                return a + fn(x + a[0, 0].astype(x.dtype) * 0, ws)
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((B, 4 * D), jnp.float32))
        return run

    mb = N_MATS * D * 4 * D
    for name, fn, ws_dev, bytes_w in [
        ("bf16", sweep_bf16, w_bf16, mb * 2),
        ("int8", sweep_i8, w_i8, mb * 1),
        (f"int4_block{BLOCK}", sweep_i4, w_i4, mb // 2),
        ("int4_flat", sweep_i4_flat, w_i4, mb // 2),
    ]:
        ms = timed(loop(fn), x, ws_dev)
        per = ms / ITERS
        gbps = bytes_w / (per * 1e-3) / 1e9
        print(
            f"{name:14s} {per*1e3:8.1f} us/sweep  {gbps:7.1f} GB/s effective"
        )


if __name__ == "__main__":
    main()
