"""Device-mesh construction and sharding policies (ICI data parallelism)."""

from .mesh import make_mesh, data_sharding, replicated_sharding, DATA_AXIS  # noqa: F401
