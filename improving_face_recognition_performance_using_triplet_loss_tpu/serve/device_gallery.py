"""Device-resident identity gallery with O(row) enrollment.

The reference's serving process keeps the identity matrix in host RAM and
rebuilds it from the DB on registration (Register_PDB -> reload,
feature_extraction/c_version/Feature.hpp:189-205, 453-667). The dynamic
pipelines (serve/pipeline.py) take that matrix as a runtime argument — but
re-normalizing and re-uploading the WHOLE gallery per enrollment costs
13-22 s at 1M x 342 through the host link (measured round 3,
tools/perf_gallery_scale.py). :class:`DeviceGallery` keeps the padded
[capacity, D] f32 matrix ON DEVICE and enrolls by updating single rows
with a donated jitted scatter — the old buffer is reused in place, no
host round-trip of gallery contents, enrollment is one [D]-vector upload.

Capacity grows by doubling (one device-side copy into a fresh padded
buffer); the enrolled row count feeds the pipelines' ``rows`` argument so
unused capacity is masked out of every match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distances import l2_normalize


@functools.partial(jax.jit, donate_argnums=0)
def _set_row(gal: jnp.ndarray, row: jnp.ndarray, vec: jnp.ndarray):
    """Normalize ``vec`` and write it at ``row`` in place (donated)."""
    return gal.at[row].set(l2_normalize(vec.astype(jnp.float32)))


@functools.partial(jax.jit, donate_argnums=0)
def _clear_row(gal: jnp.ndarray, row: jnp.ndarray):
    return gal.at[row].set(jnp.zeros((gal.shape[1],), jnp.float32))


@functools.partial(jax.jit, static_argnums=1)
def _grow(gal: jnp.ndarray, new_capacity: int):
    # not donated: XLA can't reuse a smaller buffer for a larger one
    pad = jnp.zeros((new_capacity - gal.shape[0], gal.shape[1]), jnp.float32)
    return jnp.concatenate([gal, pad])


class DeviceGallery:
    """L2-normalized gallery rows resident in device HBM.

    ``gallery_n`` and ``rows`` plug straight into the dynamic pipelines::

        dg = DeviceGallery(dim=342, capacity=1024)
        idx = dg.add(embedding)                    # O(row), no re-upload
        out = pipeline(frame, dg.gallery_n, dg.rows_arg)

    Each capacity (doubling) is a new gallery SHAPE — one pipeline
    recompile per doubling, amortized to nothing over a DB's lifetime.
    """

    def __init__(self, dim: int, capacity: int = 1024,
                 initial: np.ndarray | None = None):
        if capacity <= 0:
            raise ValueError(f"capacity must be positive, got {capacity}")
        self.dim = int(dim)
        self.rows = 0
        if initial is not None:
            initial = np.asarray(initial, np.float32)
            if initial.ndim != 2 or initial.shape[1] != dim:
                raise ValueError(
                    f"initial gallery must be [G, {dim}], got "
                    f"{initial.shape}")
            while capacity < initial.shape[0]:
                capacity *= 2
            buf = np.zeros((capacity, dim), np.float32)
            norm = np.sqrt((initial * initial).sum(-1, keepdims=True))
            buf[:initial.shape[0]] = initial / np.maximum(norm, 1e-12)
            self.rows = initial.shape[0]
            self._gal = jnp.asarray(buf)
        else:
            self._gal = jnp.zeros((capacity, dim), jnp.float32)

    @property
    def capacity(self) -> int:
        return self._gal.shape[0]

    @property
    def gallery_n(self) -> jnp.ndarray:
        """The [capacity, D] normalized device matrix (padding rows are
        zero AND masked by ``rows`` in the pipelines)."""
        return self._gal

    @property
    def rows_arg(self) -> jnp.ndarray:
        """The enrolled-row count as the pipelines' ``rows`` argument."""
        return jnp.int32(self.rows)

    def add(self, vec: np.ndarray) -> int:
        """Enroll one embedding (normalized on device); returns its row.
        Doubles capacity when full — the only operation that changes the
        gallery shape (and thus triggers a pipeline recompile)."""
        vec = jnp.asarray(vec, jnp.float32)
        if vec.shape != (self.dim,):
            raise ValueError(f"expected [{self.dim}] embedding, got "
                             f"{vec.shape}")
        if self.rows == self.capacity:
            self._gal = _grow(self._gal, self.capacity * 2)
        row = self.rows
        self._gal = _set_row(self._gal, jnp.int32(row), vec)
        self.rows += 1
        return row

    def set_row(self, row: int, vec: np.ndarray) -> None:
        """Overwrite an enrolled row (re-enrollment / identity update)."""
        if not 0 <= row < self.rows:
            raise IndexError(f"row {row} not enrolled (rows={self.rows})")
        self._gal = _set_row(self._gal, jnp.int32(row),
                             jnp.asarray(vec, jnp.float32))

    def clear_row(self, row: int) -> None:
        """Zero an enrolled row (deletion tombstone: a zero row inside
        ``rows`` cosines to 0 and loses to any real match above a
        positive threshold; compact with ``from_rows`` when tombstones
        accumulate)."""
        if not 0 <= row < self.rows:
            raise IndexError(f"row {row} not enrolled (rows={self.rows})")
        self._gal = _clear_row(self._gal, jnp.int32(row))

    def to_host(self) -> np.ndarray:
        """The enrolled (normalized) rows as a host array."""
        return np.asarray(self._gal[:self.rows])
