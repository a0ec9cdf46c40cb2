"""Bounding-box ops for the MTCNN cascade: NMS, box regression, squaring,
padding, and PNet heatmap decoding.

Numpy functions implement the exact semantics of the vendored facenet
versions (reference detect_face.py:626-744) — they are the spec/oracle for
tests. ``nms_jax`` is a fixed-capacity on-device variant (XLA needs static
shapes, SURVEY.md §7 hard parts) validated against the numpy oracle.

Box layout: [x1, y1, x2, y2, score] rows (float).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .oracles import (  # noqa: F401  (numeric-spec oracles, see oracles.py)
    bbreg,
    generate_bounding_box,
    nms,
    pad,
    rerec,
)


def nms_jax(boxes: jnp.ndarray, threshold: float, method: str = "Union",
            max_out: int | None = None) -> jnp.ndarray:
    """Fixed-capacity greedy NMS inside jit.

    Args:
      boxes: [N, 5] (invalid rows must carry score -inf).
      max_out: output capacity (default N).

    Returns:
      keep_idx [max_out] int32, padded with -1.
    """
    n = boxes.shape[0]
    max_out = max_out or n
    x1, y1, x2, y2, s = (boxes[:, i] for i in range(5))
    area = (x2 - x1 + 1) * (y2 - y1 + 1)

    def body(carry, _):
        alive, out_i, keep = carry
        masked = jnp.where(alive, s, -jnp.inf)
        i = jnp.argmax(masked)
        valid = masked[i] > -jnp.inf
        keep = keep.at[out_i].set(jnp.where(valid, i, -1).astype(jnp.int32))
        xx1 = jnp.maximum(x1[i], x1)
        yy1 = jnp.maximum(y1[i], y1)
        xx2 = jnp.minimum(x2[i], x2)
        yy2 = jnp.minimum(y2[i], y2)
        inter = jnp.maximum(0.0, xx2 - xx1 + 1) * jnp.maximum(0.0, yy2 - yy1 + 1)
        if method == "Min":
            o = inter / jnp.minimum(area[i], area)
        else:
            o = inter / (area[i] + area - inter)
        alive = alive & (o <= threshold)
        alive = alive.at[i].set(False)
        alive = jnp.where(valid, alive, jnp.zeros_like(alive))
        return (alive, out_i + jnp.where(valid, 1, 0), keep), None

    alive0 = s > -jnp.inf
    keep0 = jnp.full((max_out,), -1, jnp.int32)
    (alive, cnt, keep), _ = jax.lax.scan(body, (alive0, 0, keep0), None,
                                         length=max_out)
    return keep
def decode_pnet_topk_jax(imap: jnp.ndarray, reg: jnp.ndarray, scale: float,
                         threshold: float, k: int) -> jnp.ndarray:
    """Device-side PNet heatmap decode with a fixed top-k capacity.

    Same geometry as ``generate_bounding_box`` (imap is transposed first,
    stride 2 / cellsize 12 grid), but instead of dynamic ``np.where`` it
    keeps the k highest-scoring cells >= threshold; rows beyond the valid
    count carry score -inf. Returns [k, 9] (q1(2) q2(2) score reg(4)).
    """
    stride, cellsize = 2.0, 12.0
    imap_t = imap.T                                # [W', H'] like the oracle
    regs_t = jnp.transpose(reg, (1, 0, 2))         # [W', H', 4]
    flat = imap_t.reshape(-1)
    masked = jnp.where(flat >= threshold, flat, -jnp.inf)
    k = min(k, flat.shape[0])
    scores, idx = jax.lax.top_k(masked, k)
    w_dim = imap_t.shape[1]
    ys = (idx // w_dim).astype(jnp.float32)        # first axis of imap_t
    xs = (idx % w_dim).astype(jnp.float32)
    regs = regs_t.reshape(-1, 4)[idx]
    q1y = jnp.trunc((stride * ys + 1.0) / scale)
    q1x = jnp.trunc((stride * xs + 1.0) / scale)
    q2y = jnp.trunc((stride * ys + cellsize) / scale)
    q2x = jnp.trunc((stride * xs + cellsize) / scale)
    boxes = jnp.stack([q1y, q1x, q2y, q2x, scores], axis=1)
    return jnp.concatenate([boxes, regs], axis=1)
