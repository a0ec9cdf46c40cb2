"""Utilities: compilation cache, logging, timers."""

from .cache import enable_compilation_cache  # noqa: F401
from .profiling import compiled_flops  # noqa: F401
