"""Device-mesh construction and sharding policies (ICI data parallelism +
class-parallel softmax over a 2-D data x model mesh)."""

from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_2d_mesh,
    make_mesh,
    make_multislice_mesh,
    replicated_sharding,
)
