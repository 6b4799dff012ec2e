#!/usr/bin/env python
"""Coarse device-time bisection of the clip frontend when xplane profiling is
unavailable (the tunnel service intermittently returns empty device planes).

Times staged sub-programs — mel only / conv stem / full encoder / encoder +
cross-KV — each repeated N times INSIDE one program (fori_loop with a carry
dependency) so the ~27 ms tunnel RTT amortizes away. The deltas attribute
frontend device time to stages.

Usage: python tools/frontend_bisect.py [model] [reps]
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

from whisper_tpu.frontend import N_FRAMES  # noqa: E402
from whisper_tpu.models import MODEL_DIMS, Whisper  # noqa: E402
from whisper_tpu.models import graphs  # noqa: E402
from whisper_tpu.ops.stft import log_mel_spectrogram_jax  # noqa: E402

N_WINDOWS = 2


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "turbo"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    dims = MODEL_DIMS[model_name]
    model = Whisper(dims, params=None, name=model_name, compute_dtype="bfloat16")
    enc, dec = model.params["encoder"], model.params["decoder"]
    n_mels, Ha, Ht = dims.n_mels, dims.n_audio_head, dims.n_text_head

    rng = np.random.RandomState(0)
    audio = jnp.asarray(
        (rng.randn((N_WINDOWS + 1) * 480000) * 3000).astype(np.int16)
    )

    def mel_windows(audio):
        mel = log_mel_spectrogram_jax(audio, n_mels)
        w = mel[:, : N_WINDOWS * N_FRAMES].reshape(n_mels, N_WINDOWS, N_FRAMES)
        return jnp.transpose(w, (1, 0, 2))

    def stem(windows, enc):
        dtype = enc["blocks"]["attn_q_w"].dtype
        x = windows.astype(dtype)
        dn = ("NCH", "OIH", "NCH")
        x = jax.lax.conv_general_dilated(
            x, enc["conv1_w"].astype(dtype), (1,), ((1, 1),), dimension_numbers=dn
        ) + enc["conv1_b"].astype(dtype)[None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, enc["conv2_w"].astype(dtype), (2,), ((1, 1),), dimension_numbers=dn
        ) + enc["conv2_b"].astype(dtype)[None, :, None]
        return jax.nn.gelu(x, approximate=False)

    stages = {
        "mel": lambda a, enc, dec: mel_windows(a),
        "mel+stem": lambda a, enc, dec: stem(mel_windows(a), enc),
        "mel+encode": lambda a, enc, dec: graphs.encode(
            enc, mel_windows(a), n_head=Ha
        ),
        "frontend": lambda a, enc, dec: graphs.cross_kv(
            dec, graphs.encode(enc, mel_windows(a), n_head=Ha), n_head=Ht
        ),
    }

    def repeated(stage):
        @jax.jit
        def run(a, enc, dec):
            def body(i, carry):
                out = stages[stage](a + (carry == -1).astype(a.dtype), enc, dec)
                leaf = jax.tree.leaves(out)[0]
                return carry + leaf.ravel()[0].astype(jnp.float32)

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return run

    prev = 0.0
    for stage in stages:
        s = timed(repeated(stage), audio, enc, dec)
        per = s / reps * 1e3
        print(
            f"{stage:12s} {per:8.2f} ms/iter   (+{per - prev:6.2f} ms vs prev stage)",
            flush=True,
        )
        prev = per


if __name__ == "__main__":
    main()
