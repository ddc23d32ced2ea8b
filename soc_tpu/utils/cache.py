"""Persistent XLA compilation cache.

The fused transport loops take minutes to compile; caching compiled
executables across processes makes reruns (tests, pipeline stages, bench)
start in seconds.
"""

import os

_ENABLED = False


def enable_compile_cache(path=None):
    global _ENABLED
    if _ENABLED:
        return
    import jax
    if path is None:
        path = os.environ.get(
            "SOC_TPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _ENABLED = True
