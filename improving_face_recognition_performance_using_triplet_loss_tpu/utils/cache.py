"""Persistent XLA compilation cache.

Cold compiles through the tunneled TPU backend run minutes for conv-heavy
graphs; the on-disk cache makes every subsequent process start fast. Safe to
call multiple times; ignores failures (e.g. read-only filesystems).

The cache directory is scoped by a CPU-feature fingerprint: XLA:CPU's AOT
cache key does NOT include the target machine features, so entries written
on one host generation get loaded on another, fail the feature check
("Target machine feature +prefer-no-gather is not supported..."), and spam
an error per load before recompiling. Scoping the directory makes a
machine change cost one recompile instead of a warning storm forever.
"""

from __future__ import annotations

import hashlib
import os
import platform

_BASE_DIR = os.path.expanduser("~/.cache/facejax_xla_cache")


def _machine_tag() -> str:
    """Stable fingerprint of this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return platform.machine() or "generic"


def enable_compilation_cache(directory: str | None = None) -> None:
    import jax

    if directory is None:
        directory = os.path.join(_BASE_DIR, _machine_tag())
    try:
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Known cosmetic quirk (jax 0.9.0): XLA:CPU AOT results embedded
        # in cached executables log a feature-check ERROR on every
        # reload (pseudo-features like +prefer-no-gather are compared
        # against raw host cpuinfo flags) and then load fine anyway.
        # jax_persistent_cache_enable_xla_caches="none" does NOT stop
        # the embedding in this version; the storm is stderr-only and
        # harmless.
    except Exception:
        pass
