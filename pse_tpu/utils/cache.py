"""Persistent XLA compilation cache.

The blocked step is a large XLA program (stencil-unrolled); cold compiles
take minutes on the remote TPU compiler.  The persistent cache makes repeat
runs (same shapes/config) start in seconds.  Verified working on the axon
remote-compile path.
"""

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path
