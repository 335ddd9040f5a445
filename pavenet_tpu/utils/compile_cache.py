"""Persistent XLA compilation cache for the user-facing CLIs.

The flagship program cold-compiles in ~5 min on a v5e (BENCH_r03
"single-call compile 306.3s"); with this cache a second process reuses
the serialized executable and starts in seconds.  The reference's CUDA
world had no equivalent cost (eager kernels), so this is TPU-native
usability surface, not reference parity.

Resolution order: explicit argument > ``PAVENET_COMPILE_CACHE`` env var >
config key ``compile_cache_dir`` > default ``~/.cache/pavenet_tpu/xla``.
Set any of them to the literal string ``'off'`` to disable.
"""
from __future__ import annotations

import os


DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pavenet_tpu", "xla")


def enable_compilation_cache(cache_dir: str | None = None,
                             cfg: dict | None = None, logger=None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory used ('' when disabled).  Safe to call before
    or after device initialization; caching triggers on the first
    compilation after the call.
    """
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("PAVENET_COMPILE_CACHE")
                 or (cfg or {}).get("compile_cache_dir")
                 or DEFAULT_CACHE_DIR)
    if str(cache_dir).lower() == "off":
        return ""
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program regardless of size/compile time (the default
    # floors skip sub-second programs; CLI startup recompiles dozens)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if logger is not None:
        logger.info(f"compilation cache: {cache_dir}")
    return cache_dir
