"""Device-side gallery matcher (TPU complement to the native AVX matcher).

For camera-scale galleries the C++ AVX scan (cpp/matcher.hpp) wins on
latency; for bulk identification (N queries x M gallery) the TPU matmul
formulation wins by orders of magnitude. Same semantics as
``Compare_Face_From_DB`` (Feature.hpp:295-343): cosine similarity, NaN-safe,
threshold filter, argmax index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distances import (gallery_sims, l2_normalize, l2_normalize_np,
                             narrow_gallery_np)


def make_gallery_matcher(gallery: np.ndarray, dtype=jnp.float32):
    """Returns a jitted (queries [N, D]) -> (idx [N], sim [N]) matcher.
    ``dtype=jnp.bfloat16`` / ``jnp.int8`` narrows the stored rows (and the
    upload) — half / quarter of the f32 bytes on the G-dominated read,
    see ops.distances.gallery_sims for the exact schemes."""
    gallery_n = jnp.asarray(narrow_gallery_np(
        l2_normalize_np(np.asarray(gallery, np.float32)), dtype))

    # gallery as a runtime argument, not a jit closure constant (see
    # make_sharded_gallery_matcher's note on constant-serialization stalls)
    @jax.jit
    def _match(gal: jnp.ndarray, queries: jnp.ndarray):
        qn = l2_normalize(queries.astype(jnp.float32))
        sims = gallery_sims(qn, gal)                      # [N, M]
        sims = jnp.where(jnp.isnan(sims), -2.0, sims)
        idx = jnp.argmax(sims, axis=-1)
        best = jnp.take_along_axis(sims, idx[:, None], axis=-1)[:, 0]
        return idx.astype(jnp.int32), best

    def match(queries: jnp.ndarray):
        return _match(gallery_n, queries)

    return match


def match_gallery_tpu(gallery: np.ndarray, queries: np.ndarray,
                      sim_th: float = 0.0, dtype=jnp.float32):
    """One-shot helper: returns (idx [N] with -1 below threshold, sim [N])."""
    idx, sim = make_gallery_matcher(gallery, dtype=dtype)(
        jnp.asarray(queries))
    idx = np.asarray(idx).astype(np.int64)
    sim = np.asarray(sim)
    idx[sim < sim_th] = -1
    return idx, sim


def make_sharded_gallery_matcher(gallery: np.ndarray, mesh=None):
    """Gallery rows sharded over the mesh's devices; one fused program does
    the per-shard cosine scan + local argmax, then a tiny [ndev, N]
    all_gather picks the global winner. Scales bulk identification past one
    chip's HBM (a 10M x 342 f32 gallery is ~13 GB — over the v5e's 16 GB
    with activations; 8-way sharding makes it ~1.7 GB/chip) while keeping
    per-query semantics identical to ``make_gallery_matcher``.

    Returns (queries [N, D]) -> (global idx [N], sim [N]). The gallery is
    padded to a device multiple with -inf-similarity rows (NaN rows also
    map to -2.0, matching Compare_Face_From_DB's NaN guard,
    Feature.hpp:312-317).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    m, d = gallery.shape
    shard = -(-m // ndev)  # ceil
    pad = shard * ndev - m
    gal = np.concatenate(
        [gallery.astype(np.float32),
         np.zeros((pad, d), np.float32)]) if pad else gallery.astype(
             np.float32)
    # zero rows L2-normalize to zero -> cosine 0; mask them to -2 by index
    gal_n = np.asarray(l2_normalize(jnp.asarray(gal)))
    gal_sharded = jax.device_put(
        gal_n, NamedSharding(mesh, P(mesh.axis_names[0], None)))
    axis = mesh.axis_names[0]

    def local_scan(gal_block, queries):
        qn = l2_normalize(queries.astype(jnp.float32))
        sims = jnp.dot(qn, gal_block.T,
                       preferred_element_type=jnp.float32)  # [N, shard]
        sims = jnp.where(jnp.isnan(sims), -2.0, sims)
        # mask padding rows (only the last device holds them)
        dev = jax.lax.axis_index(axis)
        row0 = dev * shard
        valid = (row0 + jnp.arange(shard)) < m
        sims = jnp.where(valid[None, :], sims, -jnp.inf)
        loc_idx = jnp.argmax(sims, axis=-1)  # [N]
        loc_sim = jnp.take_along_axis(sims, loc_idx[:, None], axis=-1)[:, 0]
        glob_idx = (row0 + loc_idx).astype(jnp.int32)
        # per-device winners ride out on an axis-sharded leading dim; the
        # [ndev, N] global argmax happens outside the shard_map (tiny next
        # to the [N, shard] scan, and it sidesteps check_vma's inability to
        # infer replication through all_gather)
        return glob_idx[None, :], loc_sim[None, :]

    from jax import shard_map

    matched = shard_map(
        local_scan, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(axis, None), P(axis, None)))

    # the gallery enters the jitted program as a RUNTIME argument, not a
    # closure: closed-over arrays embed as compile-time constants, and at
    # the multi-GB scale this matcher exists for, constant serialization
    # stalls XLA (measured round 3 at 1M x 342 — BASELINE.md
    # "Production-scale galleries")
    @jax.jit
    def _match(gal: jnp.ndarray, queries: jnp.ndarray):
        idxs, sims = matched(gal, queries)  # [ndev, N]
        win = jnp.argmax(sims, axis=0)  # first max = lowest device = lowest row
        best_sim = jnp.take_along_axis(sims, win[None, :], axis=0)[0]
        best_idx = jnp.take_along_axis(idxs, win[None, :], axis=0)[0]
        return best_idx, best_sim

    def match(queries: jnp.ndarray):
        return _match(gal_sharded, queries)

    return match


def match_gallery_sharded(gallery: np.ndarray, queries: np.ndarray,
                          sim_th: float = 0.0, mesh=None):
    """One-shot sharded helper mirroring ``match_gallery_tpu``."""
    idx, sim = make_sharded_gallery_matcher(gallery, mesh)(
        jnp.asarray(queries))
    idx = np.asarray(idx).astype(np.int64)
    sim = np.asarray(sim)
    idx[sim < sim_th] = -1
    return idx, sim
