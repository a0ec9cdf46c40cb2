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

from ..ops.distances import l2_normalize


def make_gallery_matcher(gallery: np.ndarray):
    """Returns a jitted (queries [N, D]) -> (idx [N], sim [N]) matcher with
    the gallery baked in as a device constant (norms precomputed)."""
    gallery_n = l2_normalize(jnp.asarray(gallery, jnp.float32))

    @jax.jit
    def match(queries: jnp.ndarray):
        qn = l2_normalize(queries.astype(jnp.float32))
        sims = jnp.dot(qn, gallery_n.T,
                       preferred_element_type=jnp.float32)  # [N, M]
        sims = jnp.where(jnp.isnan(sims), -2.0, sims)
        idx = jnp.argmax(sims, axis=-1)
        best = jnp.take_along_axis(sims, idx[:, None], axis=-1)[:, 0]
        return idx.astype(jnp.int32), best

    return match


def match_gallery_tpu(gallery: np.ndarray, queries: np.ndarray,
                      sim_th: float = 0.0):
    """One-shot helper: returns (idx [N] with -1 below threshold, sim [N])."""
    idx, sim = make_gallery_matcher(gallery)(jnp.asarray(queries))
    idx = np.asarray(idx).astype(np.int64)
    sim = np.asarray(sim)
    idx[sim < sim_th] = -1
    return idx, sim
