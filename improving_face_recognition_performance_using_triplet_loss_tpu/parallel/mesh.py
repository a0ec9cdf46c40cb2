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


def make_multislice_mesh(
    ici_size: int | None = None,
    dcn_axis: str = "dcn",
    ici_axis: str = DATA_AXIS,
) -> Mesh:
    """2-D mesh for multislice pods: outer DCN axis x inner ICI axis.

    Collectives along ``ici_axis`` ride the fast intra-slice interconnect;
    gradient aggregation across slices goes over DCN (SURVEY.md §5.8's
    multislice note). On a single slice this degenerates to (1, n).
    """
    devices = jax.devices()
    n = len(devices)
    if ici_size is None:
        # one slice per process by default; single-process -> single slice
        ici_size = n // max(jax.process_count(), 1)
    if n % ici_size:
        raise ValueError(f"{n} devices do not split into ICI groups of "
                         f"{ici_size}")
    arr = np.asarray(devices).reshape(n // ici_size, ici_size)
    return Mesh(arr, (dcn_axis, ici_axis))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Batch-dim sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (for parameters / optimizer state)."""
    return NamedSharding(mesh, P())


MODEL_AXIS = "model"


def make_2d_mesh(model_size: int, data_axis: str = DATA_AXIS,
                 model_axis: str = MODEL_AXIS) -> Mesh:
    """2-D (data, model) mesh: batch over ``data``, class-parallel softmax
    over ``model`` (losses/sharded.py — the TPU-native realization of the
    reference's never-activated ctx_group model parallelism,
    mutli_gpu_v3.py:74-98)."""
    devices = jax.devices()
    n = len(devices)
    if n % model_size:
        raise ValueError(f"{n} devices do not split into model groups of "
                         f"{model_size}")
    arr = np.asarray(devices).reshape(n // model_size, model_size)
    return Mesh(arr, (data_axis, model_axis))
