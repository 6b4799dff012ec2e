"""Process-level runtime configuration.

Enables JAX's persistent compilation cache for every whisper_tpu process.
This is the TPU analog of the reference's on-disk `.mlmodelc` artifacts +
the OS ANE compilation cache, which turn a 4m14s first load into a 1.5s
cached load (/root/reference/README.md:26-27,42-50): the first compile of
each graph is expensive (the XLA TPU compile of the fused decode loop runs
minutes), every later process start reuses the cached executable.

Environment knobs:
  WHISPER_TPU_CACHE_DIR  — cache location (default ~/.cache/whisper_tpu/xla,
                           or the repo-local .jax_cache if it exists)
  WHISPER_TPU_NO_CACHE=1 — disable entirely
"""

import os

_configured = False


def configure_jax_cache():
    """Called lazily (on first model construction, after the backend exists)
    rather than at import: the cache is only enabled on the TPU backend.
    Under the axon tunnel even 'CPU' helper executables are compiled on the
    remote server, so loading them from the cache on the local CPU trips
    machine-feature mismatches (potential SIGILL)."""
    global _configured
    if _configured or os.environ.get("WHISPER_TPU_NO_CACHE"):
        _configured = True
        return

    import jax

    try:
        if jax.default_backend() != "tpu":
            _configured = True
            return
    except Exception:
        return  # backend not ready; retry on next call

    cache_dir = os.environ.get("WHISPER_TPU_CACHE_DIR")
    if cache_dir is None:
        repo_local = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
        if os.path.isdir(repo_local):
            cache_dir = repo_local
        else:
            default = os.path.join(os.path.expanduser("~"), ".cache")
            cache_dir = os.path.join(
                os.getenv("XDG_CACHE_HOME", default), "whisper_tpu", "xla"
            )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these options
    _configured = True
