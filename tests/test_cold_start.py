"""Persistent-compilation-cache cold start: the .mlmodelc-cache analog.

The reference's selling point is the OS-cached ANE load: 4m14s first load ->
1.5s cached (/root/reference/README.md:27). whisper_tpu's analog is JAX's
persistent compilation cache (runtime_config.configure_jax_cache + the
repo-shipped .jax_cache/): the first process compiles, every later process
deserializes.

These tests validate the MECHANISM on the local CPU backend, where the
client-side cache is authoritative: a fresh process with a warm cache must
load the fused-decode program dramatically faster than the process that
compiled it. (On the shared axon TPU tunnel the server recompiles
deserialized executables on first execution, so wall-clock cold start there
is service-bound — see TODO.md "Cold start" for the measurements.)
"""

import json
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import json, os, sys, time
cache_dir = sys.argv[1]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
)
os.environ["WHISPER_TPU_NO_CACHE"] = "1"  # runtime_config stays out of the way
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp
from functools import partial

from whisper_tpu.engine_fused import FusedConfig, fused_decode
from whisper_tpu.models import graphs
from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models import Whisper

dims = ModelDimensions(
    n_mels=80, n_audio_ctx=96, n_audio_state=128, n_audio_head=2, n_audio_layer=2,
    n_vocab=51865, n_text_ctx=448, n_text_state=128, n_text_head=2, n_text_layer=2,
)
model = Whisper(dims, params=None, name="coldstart", compute_dtype="float32")
cfg = FusedConfig(
    n_group=2, n_audio=1, beam_search=True, use_timestamps=True, max_candidates=2,
    eot=50257, timestamp_begin=50365, no_timestamps=50364, no_speech=50363,
    last_window=128,
)
fn = jax.jit(partial(fused_decode, n_head=2, cfg=cfg, cache_dtype=jnp.float32))

V, n_ctx = dims.n_vocab, graphs.CACHE_SLOTS
toks = np.zeros((1, n_ctx), np.int32); toks[:, :3] = [50258, 50259, 50359]
L, H, dh = 2, 2, 64
ck = jnp.zeros((L, 1, H, dh, dims.n_audio_ctx), jnp.float32)
cv = jnp.zeros((L, 1, H, dh, dims.n_audio_ctx), jnp.float32)
args = (
    model.params["decoder"], jnp.asarray(toks), jnp.asarray(3, jnp.int32),
    ck, cv, jnp.asarray(0, jnp.int32),
    jnp.zeros(V, bool), jnp.zeros(V, bool), jnp.asarray(50, jnp.int32),
    jnp.asarray(8, jnp.int32), jnp.asarray(0.0, jnp.float32), jnp.asarray(0, jnp.int32),
)
t0 = time.perf_counter()
compiled = fn.lower(*args).compile()
out = jax.device_get(compiled(*args))
print(json.dumps({"load_s": time.perf_counter() - t0, "n_tokens": int(out[1])}))
"""


@pytest.mark.slow
def test_persistent_cache_cold_start(tmp_path):
    cache_dir = str(tmp_path / "cache")
    os.makedirs(cache_dir)
    script = str(tmp_path / "child.py")
    with open(script, "w") as f:
        f.write(_CHILD)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run():
        env = dict(os.environ)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, script, cache_dir],
            capture_output=True, text=True, timeout=600,
            cwd=repo_root, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    first = run()
    assert os.listdir(cache_dir), "first process wrote no cache entries"
    second = run()
    assert second["n_tokens"] == first["n_tokens"]
    # deserialization must be dramatically cheaper than compilation; 2x is a
    # deliberately loose bound (CI machines vary), typical is 10-30x
    assert second["load_s"] < first["load_s"] / 2.0, (
        f"cached load {second['load_s']:.2f}s not faster than "
        f"fresh compile {first['load_s']:.2f}s"
    )
