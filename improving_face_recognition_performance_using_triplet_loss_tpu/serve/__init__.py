"""Serving: export manifest, gallery matcher, native C++ bindings."""

from .export import export_params, load_exported_params  # noqa: F401
