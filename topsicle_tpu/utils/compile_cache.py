"""Persistent XLA compilation cache.

The reference tool has no compile step; here first-compile of the scan
programs costs seconds to minutes on remote TPU toolchains (the step-2
window scan is a large fused graph).  Enabling JAX's persistent
compilation cache makes every run after the first start in well under a
second per program, which matters for a CLI tool invoked per input
batch/job (the reference's usage model, README.md:261-270 splits work
into many short jobs).
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    env = os.environ.get("TOPSICLE_COMPILE_CACHE")
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "topsicle_tpu", "jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (created if
    missing).  Respects an explicit JAX_COMPILATION_CACHE_DIR already in
    the environment.  Returns the directory in use, or None if the cache
    could not be enabled (old JAX, read-only filesystem, ...)."""
    import jax

    target = os.environ.get("JAX_COMPILATION_CACHE_DIR") or path or default_cache_dir()
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        # cache every program, even fast-compiling ones: dispatch through
        # a remote tunnel makes "fast" compiles cost seconds too
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return target
    except Exception:
        return None
