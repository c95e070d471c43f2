"""Persistent XLA compilation cache setup.

The flagship codec scan takes minutes to compile through a remote-TPU
tunnel; with the persistent cache a later process loads the executable
in <1 s. Called by every entry point (bench, CLI, tools)."""

import os


def enable(cache_dir=None):
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/jax_lbic"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
