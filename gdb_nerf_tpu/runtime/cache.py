"""Persistent XLA compilation cache setup.

The full eval graph takes many minutes to compile; caching compiled
executables on disk makes subsequent process launches near-instant.
Call ``enable()`` before the first jit execution (run.py / train_net.py /
bench.py all do).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "GDB_NERF_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gdb_nerf_tpu", "xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - version drift
        print(f"[cache] could not enable compilation cache: {e}")
