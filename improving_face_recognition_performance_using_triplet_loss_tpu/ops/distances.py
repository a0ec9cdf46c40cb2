"""Pairwise / rowwise distance kernels (MXU-friendly formulations).

The reference computes cosine similarity one row at a time with host syncs
(train_efm.py:26-34 — a per-row ``mx.nd.dot`` + ``asscalar`` loop). Here the
whole batch is one matmul on the MXU, inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Row-wise L2 normalization (reference: ``fc[v]/mx.nd.norm(fc[v])``,
    extract_feacture_v2.py:70)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def l2_normalize_np(x, axis: int = -1, eps: float = 1e-12):
    """Host-side (numpy) row-wise L2 normalization with the SAME eps-clamp
    semantics as :func:`l2_normalize`. The single source of truth for every
    host-prepared gallery (DeviceGallery.__init__, serve.pipeline
    .shard_gallery) so host- and device-normalized rows stay bit-comparable."""
    import numpy as np

    x = np.asarray(x, np.float32)
    norm = np.sqrt(np.sum(np.square(x), axis=axis, keepdims=True))
    return x / np.maximum(norm, eps)


def narrow_gallery(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Device-side narrowing of L2-NORMALIZED gallery rows to the storage
    dtype. int8 stores ``round(127 * normalized)`` clipped to [-127, 127]
    — THE 127-scale convention; serve.pipeline.gallery_sims rescales after
    the matmul, and :func:`narrow_gallery_np` is the host twin (keep the
    two in lockstep)."""
    if dtype == jnp.int8:
        return jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
    return x.astype(dtype)


def narrow_gallery_np(gal_n, dtype):
    """Host-side twin of :func:`narrow_gallery`: narrow L2-NORMALIZED rows
    BEFORE the device transfer (half/quarter link bytes; no wide copy
    transiting HBM)."""
    import numpy as np

    dtype = jnp.dtype(dtype)
    if dtype == jnp.int8:
        return np.clip(np.round(gal_n * 127.0), -127, 127).astype(np.int8)
    if dtype != jnp.float32:
        return gal_n.astype(dtype)
    return gal_n


def gallery_sims(emb: jnp.ndarray, gallery_n: jnp.ndarray) -> jnp.ndarray:
    """[..., D] normalized probe(s) x [G, D] STORED gallery rows ->
    [..., G] cosine similarities, honoring the storage dtype:

    - f32/bf16 rows multiply directly — XLA fuses the widening convert
      into the matmul's operand read, so HBM traffic stays narrow
      (f32 x bf16 is an MXU-native pairing);
    - int8 rows hold ``round(127 * normalized)`` (:func:`narrow_gallery`);
      the PROBE is quantized to the same grid on the fly (tiny — [N, D])
      so the product is an int8 x int8 int32-accumulated matmul, the
      MXU's native int8 pairing and the same both-operands scheme as the
      native AVX2 matcher — a quarter of the f32 bytes on the
      G-dominated read, rescaled by 1/127^2 after the matmul (combined
      quantization error ~4e-3 cosine; the int32 accumulator never
      overflows: D * 127^2 < 2^31 up to D ~ 133k).

    Every pipeline/matcher match goes through here so a gallery's dtype
    is decided once, at storage time."""
    if gallery_n.dtype == jnp.int8:
        q = narrow_gallery(emb.astype(jnp.float32), jnp.int8)
        sims = jnp.matmul(q, gallery_n.T,
                          preferred_element_type=jnp.int32)
        return sims.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
    return emb @ gallery_n.T


def pairwise_sq_l2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, D] x [M, D] -> [N, M] squared euclidean distances.

    Uses the ||a||^2 + ||b||^2 - 2ab identity so the O(N*M*D) work is a single
    MXU matmul instead of broadcast-subtract materialization.
    """
    a2 = jnp.sum(jnp.square(a), axis=-1, keepdims=True)          # [N, 1]
    b2 = jnp.sum(jnp.square(b), axis=-1, keepdims=True).T        # [1, M]
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)            # [N, M]
    d = a2 + b2 - 2.0 * ab
    return jnp.maximum(d, 0.0)


def pairwise_cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """[N, D] x [M, D] -> [N, M] cosine similarities."""
    an = l2_normalize(a, eps=eps)
    bn = l2_normalize(b, eps=eps)
    return jnp.dot(an, bn.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def rowwise_cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-i-vs-row-i cosine similarity, [N, D] x [N, D] -> [N].

    Matches the reference's per-row loop (train_efm.py:26-34) in one fused op.
    """
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.sqrt(jnp.sum(jnp.square(a), axis=-1))
    nb = jnp.sqrt(jnp.sum(jnp.square(b), axis=-1))
    return dot / jnp.maximum(na * nb, eps)
