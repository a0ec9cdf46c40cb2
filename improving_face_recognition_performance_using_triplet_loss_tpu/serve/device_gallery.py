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

With ``mesh=`` the SAME class backs the gallery-sharded pipeline
(serve/pipeline.py::make_gallery_sharded_multistream_pipeline): rows are
sharded ``P(gallery_axis, None)`` exactly like :func:`~..serve.pipeline
.shard_gallery`, and enrollment stays an O(row) donated scatter — the
one-row dynamic-update-slice lands on one shard, so identity DBs beyond a
single chip's HBM enroll without ever re-uploading (shard_gallery's
re-upload path costs seconds at 1M rows; see BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distances import (l2_normalize, l2_normalize_np, narrow_gallery,
                             narrow_gallery_np)


def _set_row_impl(gal: jnp.ndarray, row: jnp.ndarray, vec: jnp.ndarray):
    """Normalize ``vec`` (always in f32) and write it at ``row`` in place
    (donated), narrowing to the gallery's storage dtype."""
    return gal.at[row].set(
        narrow_gallery(l2_normalize(vec.astype(jnp.float32)), gal.dtype))


def _clear_row_impl(gal: jnp.ndarray, row: jnp.ndarray):
    return gal.at[row].set(jnp.zeros((gal.shape[1],), gal.dtype))


def _grow_impl(gal: jnp.ndarray, new_capacity: int):
    # not donated: XLA can't reuse a smaller buffer for a larger one
    pad = jnp.zeros((new_capacity - gal.shape[0], gal.shape[1]), gal.dtype)
    return jnp.concatenate([gal, pad])


@functools.lru_cache(maxsize=32)
def _ops_for(sharding):
    """Jitted (set_row, clear_row, grow) pinned to ``sharding`` (or the
    default single-device placement when ``None``). Cached per sharding so
    long-lived galleries never recompile; the scatter/clear donate the old
    buffer — with a row-sharded gallery the one-row dynamic-update-slice
    touches a single shard, the rest of the matrix never moves.

    The cache is BOUNDED (a NamedSharding key pins its Mesh and device
    objects — an unbounded cache would leak meshes in long-lived
    processes that re-shard); 32 distinct shardings far exceeds any real
    serving process, and eviction only costs a recompile."""
    kw = {} if sharding is None else {"out_shardings": sharding}
    return (
        jax.jit(_set_row_impl, donate_argnums=0, **kw),
        jax.jit(_clear_row_impl, donate_argnums=0, **kw),
        jax.jit(_grow_impl, static_argnums=1, **kw),
    )


class DeviceGallery:
    """L2-normalized gallery rows resident in device HBM.

    ``gallery_n`` and ``rows`` plug straight into the dynamic pipelines::

        dg = DeviceGallery(dim=342, capacity=1024)
        idx = dg.add(embedding)                    # O(row), no re-upload
        out = pipeline(frame, dg.gallery_n, dg.rows_arg)

    Each capacity (doubling) is a new gallery SHAPE — one pipeline
    recompile per doubling, amortized to nothing over a DB's lifetime.

    With ``mesh=`` (and the pipeline's ``gallery_axis``) the matrix is
    row-sharded over the mesh and plugs into
    ``make_gallery_sharded_multistream_pipeline(fn)(frames, dg.gallery_n,
    dg.rows_arg)``; capacity rounds up to an axis-size multiple.

    ``dtype=jnp.bfloat16`` halves (``jnp.int8`` quarters, 127-scale —
    see :func:`~.pipeline.normalize_gallery` incl. its int8 caveats) the
    matrix's HBM bytes and the bandwidth-bound match stage's traffic at
    production gallery scale; rows are still normalized in f32 before
    narrowing.

    **Buffer-donation contract:** mutations (``add`` / ``set_row`` /
    ``clear_row``) update the device matrix IN PLACE by donating the old
    buffer to XLA — that in-place reuse is what makes enrollment O(row).
    The flip side: any ``gallery_n`` reference taken BEFORE a mutation is
    invalidated by it (JAX raises "Array has been deleted" on next use).
    Re-read ``dg.gallery_n`` after every mutation — fetch it per dispatch,
    don't cache it across enrollments.
    """

    def __init__(self, dim: int, capacity: int = 1024,
                 initial: np.ndarray | None = None,
                 mesh=None, gallery_axis: str = "model",
                 dtype=jnp.float32):
        if capacity <= 0:
            raise ValueError(f"capacity must be positive, got {capacity}")
        self.dim = int(dim)
        self.rows = 0
        self.dtype = jnp.dtype(dtype)
        self._sharding = None
        if mesh is not None:
            # gallery ROWS sharded over the mesh axis, matching
            # serve.pipeline.shard_gallery / the gallery-sharded pipeline's
            # gal_spec; capacity rounds up to an axis multiple (doubling
            # preserves it), padding rows are masked by ``rows``
            from jax.sharding import NamedSharding, PartitionSpec as P

            ndev = mesh.shape[gallery_axis]
            capacity += (-capacity) % ndev
            self._sharding = NamedSharding(mesh, P(gallery_axis, None))
        self._set_row, self._clear_row, self._grow = _ops_for(self._sharding)
        if initial is not None:
            initial = np.asarray(initial, np.float32)
            if initial.ndim != 2 or initial.shape[1] != dim:
                raise ValueError(
                    f"initial gallery must be [G, {dim}], got "
                    f"{initial.shape}")
            while capacity < initial.shape[0]:
                capacity *= 2
            buf = np.zeros((capacity, dim), np.float32)
            buf[:initial.shape[0]] = l2_normalize_np(initial)
            self.rows = initial.shape[0]
            self._gal = self._put(buf)
        else:
            self._gal = self._put(np.zeros((capacity, dim), np.float32))

    def _put(self, buf: np.ndarray) -> jnp.ndarray:
        if buf.dtype != self.dtype:
            # narrow on HOST: half/quarter transfer bytes, no wide copy
            # transiting HBM (buf rows are already L2-normalized)
            buf = narrow_gallery_np(buf, self.dtype)
        return (jnp.asarray(buf) if self._sharding is None
                else jax.device_put(buf, self._sharding))

    @property
    def capacity(self) -> int:
        return self._gal.shape[0]

    @classmethod
    def from_rows(cls, rows: np.ndarray, capacity: int = 1024,
                  keep: np.ndarray | None = None,
                  mesh=None, gallery_axis: str = "model",
                  dtype=jnp.float32) -> "DeviceGallery":
        """Build a gallery from a [G, D] host matrix — the compaction path
        when :meth:`clear_row` tombstones accumulate::

            keep = np.ones(dg.rows, bool); keep[deleted_rows] = False
            dg = DeviceGallery.from_rows(dg.to_host(), keep=keep)

        Row indices change under compaction: remap any externally held row
        ids via ``np.cumsum(keep) - 1``."""
        rows = np.asarray(rows, np.float32)
        if rows.ndim != 2:
            raise ValueError(f"rows must be [G, D], got {rows.shape}")
        if keep is not None:
            rows = rows[np.asarray(keep, bool)]
        return cls(dim=rows.shape[1], capacity=capacity, initial=rows,
                   mesh=mesh, gallery_axis=gallery_axis, dtype=dtype)

    @property
    def gallery_n(self) -> jnp.ndarray:
        """The [capacity, D] normalized device matrix (padding rows are
        zero AND masked by ``rows`` in the pipelines).

        This is the LIVE buffer, not a copy: it is donated (invalidated)
        by the next ``add``/``set_row``/``clear_row`` — re-read it after
        every mutation (see the class docstring)."""
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
            self._gal = self._grow(self._gal, self.capacity * 2)
        row = self.rows
        self._gal = self._set_row(self._gal, jnp.int32(row), vec)
        self.rows += 1
        return row

    def set_row(self, row: int, vec: np.ndarray) -> None:
        """Overwrite an enrolled row (re-enrollment / identity update)."""
        if not 0 <= row < self.rows:
            raise IndexError(f"row {row} not enrolled (rows={self.rows})")
        vec = jnp.asarray(vec, jnp.float32)
        if vec.shape != (self.dim,):
            raise ValueError(f"expected [{self.dim}] embedding, got "
                             f"{vec.shape}")
        self._gal = self._set_row(self._gal, jnp.int32(row), vec)

    def clear_row(self, row: int) -> None:
        """Zero an enrolled row (deletion tombstone: a zero row inside
        ``rows`` cosines to 0 and loses to any real match above a
        positive threshold; compact with :meth:`from_rows` when tombstones
        accumulate)."""
        if not 0 <= row < self.rows:
            raise IndexError(f"row {row} not enrolled (rows={self.rows})")
        self._gal = self._clear_row(self._gal, jnp.int32(row))

    def to_host(self) -> np.ndarray:
        """The enrolled (normalized) rows as a host f32 array, widened
        from the storage dtype (int8 rows rescale back from the 127-scale
        convention)."""
        rows = np.asarray(self._gal[:self.rows], np.float32)
        if self.dtype == jnp.int8:
            rows = rows * (1.0 / 127.0)
        return rows
