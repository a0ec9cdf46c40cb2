"""Mesh + sharding helpers.

The reference's only distribution mechanism is MXNet KVStore 'local' gradient
aggregation over 2 GPUs (mutli_gpu_v3.py:117,153,158 — SURVEY.md §5.8). The
TPU-native replacement is a 1-D ``data`` mesh over ICI with
``shard_map``-compiled ``psum``/``all_gather`` collectives; batch axis
sharded, parameters replicated. Multislice would add an outer DCN axis —
single-slice meshes here.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Batch-dim sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (for parameters / optimizer state)."""
    return NamedSharding(mesh, P())
