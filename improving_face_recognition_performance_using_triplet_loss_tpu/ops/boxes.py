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
        # the oracle (facenet nms: ascending argsort, pop from the END)
        # breaks score ties by HIGHEST index; argmax alone would pick the
        # lowest — reverse so ties match the reference exactly
        i = n - 1 - jnp.argmax(masked[::-1])
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
def nms_mask_jax(boxes: jnp.ndarray, threshold: float,
                 method: str = "Union", block: int = 32,
                 return_passes: bool = False) -> jnp.ndarray:
    """Exact greedy NMS as a BOUNDED parallel iteration — returns a keep
    mask.

    ``nms_jax`` computes greedy NMS with a ``max_out``-long sequential
    ``lax.scan`` (data-dependent argmax each step). On TPU those serial
    iterations dominate the fused cascade's latency (~1800 of them per
    frame across stages — tools/perf_detect_breakdown.py). This variant
    uses the recursive definition directly: in score order, box j survives
    iff no SURVIVING higher-scored box overlaps it above threshold — the
    unique fixed point of ``k = valid & ~(O^T k)`` over the strictly
    upper-triangular overlap DAG ``O``.

    The round-3 form iterated that update over the FULL matrix, which
    converges in suppression-chain-depth passes — "typically < 8" but an
    adversarial dense-overlap frame (one long alternating chain) degrades
    to ~N serial [N, N] passes, worse than the sequential scan it
    replaced (VERDICT r3 item 4). This form is block Gauss-Seidel over
    the score order: a FIXED-LENGTH scan over ``ceil(N/B)`` blocks; each
    block applies the already-final prefix decisions in one [N, B]
    reduction, then resolves its own [B, B] sub-DAG with an inner fixed
    point that is PROVABLY final after <= B passes (after pass p the
    first p in-block decisions are final, by induction — pass p+1
    computes box p+1 from final inputs). Worst case is therefore
    structural: one [N, N]-total prefix sweep + at most N inner [B, B]
    passes, independent of box geometry — no convergence cond, no
    fallback branch (a ``lax.cond`` fallback would de-optimize under the
    cascade's ``vmap``, where both branches execute). Typical frames
    leave each inner loop after 1-2 passes (the while early-exits), so
    the common case stays a handful of small reductions.

    Equivalence with the sequential greedy and the numpy oracle is pinned
    in tests/test_property_based.py, including score ties (the oracle
    pops from the END of an ascending argsort, so ties break by HIGHEST
    index — reproduced here by sorting the reversed array) and the
    adversarial chain itself.

    Args:
      boxes: [N, 5]; invalid rows must carry score -inf.
      block: Gauss-Seidel block size B (worst-case inner passes/block).
      return_passes: also return the [ceil(N/B)] inner pass counts
        (diagnostics for tools/perf_nms_adversarial.py).
    Returns:
      keep [N] bool, in the ORIGINAL row order (and optionally passes).
    """
    n = boxes.shape[0]
    s = boxes[:, 4]
    # sort by (-score, -index): stable ascending argsort on the reversed
    # scores, mapped back — ties break by highest original index, the
    # oracle's semantics (oracles.py::nms, detect_face.py:626-660)
    order = n - 1 - jnp.argsort(-s[::-1], stable=True)
    b = boxes[order]
    bsz = max(1, min(block, n))
    nb = -(-n // bsz)
    m = nb * bsz
    pad = m - n
    x1, y1, x2, y2, sc = (
        jnp.pad(b[:, i], (0, pad),
                constant_values=(-jnp.inf if i == 4 else 0.0))
        for i in range(5))
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = (jnp.maximum(0.0, xx2 - xx1 + 1)
             * jnp.maximum(0.0, yy2 - yy1 + 1))
    if method == "Min":
        o = inter / jnp.minimum(area[:, None], area[None, :])
    else:
        o = inter / (area[:, None] + area[None, :] - inter)
    # O[i, j]: higher-ranked i suppresses j (strict: i before j)
    tri = jnp.arange(m)[:, None] < jnp.arange(m)[None, :]
    suppr = (o > threshold) & tri & jnp.isfinite(o)
    valid = jnp.isfinite(sc) & (sc > -jnp.inf)

    def resolve_block(keep, t):
        start = t * bsz
        cols = jax.lax.dynamic_slice(suppr, (0, start), (m, bsz))  # [m, B]
        # decisions for every earlier block are FINAL in `keep`; rows in
        # this/later blocks can't suppress (strict upper triangle)
        pre = jnp.any(cols & keep[:, None], axis=0)                # [B]
        sub = jax.lax.dynamic_slice(cols, (start, 0), (bsz, bsz))  # [B, B]
        vblk = jax.lax.dynamic_slice(valid, (start,), (bsz,)) & ~pre

        def istep(kb):
            return vblk & ~jnp.any(sub & kb[:, None], axis=0)

        kb0 = vblk
        kb1 = istep(kb0)

        def icond(st):
            kb, prev, it = st
            return jnp.any(kb != prev) & (it < bsz)

        def ibody(st):
            kb, _, it = st
            return istep(kb), kb, it + 1

        kb, _, it = jax.lax.while_loop(
            icond, ibody, (kb1, kb0, jnp.ones((), jnp.int32)))
        return jax.lax.dynamic_update_slice(keep, kb, (start,)), it

    keep, passes = jax.lax.scan(resolve_block, jnp.zeros((m,), bool),
                                jnp.arange(nb))
    mask = jnp.zeros((n,), bool).at[order].set(keep[:n])
    if return_passes:
        return mask, passes
    return mask


def nms_mask(boxes: jnp.ndarray, threshold: float, method: str = "Union",
             use_pallas: bool | None = None) -> jnp.ndarray:
    """Backend-dispatched keep-mask NMS: the one-dispatch Pallas kernel on
    TPU (ops/pallas/nms_kernel.py — the round-4 trace put 62% of fused
    single-frame device time in the scan+while dispatch overhead of the
    XLA form), ``nms_mask_jax`` elsewhere. Identical keep sets are pinned
    in tests/test_pallas_nms.py; ``use_pallas`` forces the choice."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .pallas.nms_kernel import nms_mask_pallas

        return nms_mask_pallas(boxes, threshold, method)
    return nms_mask_jax(boxes, threshold, method)


def nms_mask_batched(boxes: jnp.ndarray, threshold: float,
                     method: str = "Union",
                     use_pallas: bool | None = None) -> jnp.ndarray:
    """Batched [S, N, 5] -> [S, N] form of ``nms_mask`` (one grid program
    per batch element on TPU; vmapped fixed point elsewhere)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .pallas.nms_kernel import nms_mask_pallas_batched

        return nms_mask_pallas_batched(boxes, threshold, method)
    return jax.vmap(lambda c: nms_mask_jax(c, threshold, method))(boxes)


def adversarial_nms_chain(n: int, width: float = 40.0) -> np.ndarray:
    """The dense-overlap WORST CASE for fixed-point NMS: one maximal
    alternating suppression chain. Unit-height boxes slide by width/4
    with strictly descending scores, so consecutive IoU = 0.6 > 0.5
    (suppresses) while skip-one IoU = 1/3 < 0.5 (doesn't): greedy keeps
    every EVEN chain position and each decision depends on the previous
    one — chain depth n, the geometry that made the round-3 full-matrix
    iteration take ~n serial [n, n] passes. The single source for both
    the bound tests (tests/test_property_based.py) and the measurement
    tool (tools/perf_nms_adversarial.py)."""
    step = width / 4.0
    x = np.arange(n) * step
    scores = 1.0 - np.arange(n) / (2.0 * n)
    return np.stack([x, np.zeros(n), x + width, np.full(n, 1.0),
                     scores], 1).astype(np.float32)


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
