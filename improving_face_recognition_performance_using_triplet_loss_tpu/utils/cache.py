"""Persistent XLA compilation cache.

Cold compiles through the tunneled TPU backend run minutes for conv-heavy
graphs; the on-disk cache makes every subsequent process start fast. Safe to
call multiple times; ignores failures (e.g. read-only filesystems).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/facejax_xla_cache")


def enable_compilation_cache(directory: str | None = None) -> None:
    import jax

    try:
        os.makedirs(directory or _DEFAULT_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          directory or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
