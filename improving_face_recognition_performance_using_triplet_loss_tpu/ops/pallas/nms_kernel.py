"""Exact greedy NMS as ONE Pallas TPU kernel per call.

``ops.boxes.nms_mask_jax`` already replaced the sequential-scan NMS with a
bounded block Gauss-Seidel fixed point, but its XLA form still executes as
a ``lax.scan`` over blocks with an inner ``lax.while_loop`` — on TPU every
loop iteration is a separately dispatched step, and the round-4
single-frame trace attributed 62% of the fused cascade's device time
(0.57 ms) to exactly those tiny sequential NMS steps (BASELINE.md round-4
attribution; the block-size sweep was flat because the cost was dispatch
count, not compute). This kernel runs the SAME algorithm — same score
order, same tie rule, same bounded inner fixed point — entirely inside one
Pallas program: boxes live in VMEM in both row and column layouts, the
per-block suppression reductions are MXU matvecs ([1, M] @ [M, B] — a
boolean ``any`` as a 0/1 dot, avoiding in-kernel transposes), and the
block loop is statically unrolled, so the whole NMS is one dispatch
regardless of pass counts.

Semantics (pinned against the numpy oracle and ``nms_mask_jax`` in
tests/test_pallas_nms.py): greedy NMS of the vendored facenet cascade
(reference detect_face.py:626-660) — descending score order with ties
broken by HIGHEST original index, invalid rows carry score -inf, keep
mask returned in the ORIGINAL row order. ``method`` is "Union" or "Min".

Worst-case bound is inherited from the block Gauss-Seidel structure
(ops/boxes.py:88-102): ceil(M/B) blocks, each inner Jacobi fixed point
provably final in <= B passes; in-kernel a pass is one small matvec plus
compares, so even the adversarial dense-overlap chain stays microseconds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(rows_ref, cols_ref, keep_ref, passes_ref, *, nb: int,
                bsz: int, m: int, threshold: float, min_method: bool):
    """One batch element: rows_ref (1, 8, m) = [x1 y1 x2 y2 score area 0 0]
    in SORTED order; cols_ref (1, m, 8) = the same transposed. Writes the
    keep mask as 0/1 f32 into keep_ref (1, 8, m) — the mask row is
    broadcast over all 8 sublanes because Mosaic requires the block's
    second-to-last dim be a multiple of 8 (a (1, m) block over an
    (S, m) array fails TPU lowering; caller reads sublane 0) — plus
    per-block inner pass counts as f32 lanes 0..nb-1 of a (1, 8, 128)
    VMEM block (same tiling constraint rules out a (1, nb) SMEM row)."""
    rows = rows_ref[0]                                  # (8, m)
    x1c = cols_ref[0, :, 0:1]                           # (m, 1) columns
    y1c = cols_ref[0, :, 1:2]
    x2c = cols_ref[0, :, 2:3]
    y2c = cols_ref[0, :, 3:4]
    areac = cols_ref[0, :, 5:6]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, bsz), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (m, bsz), 1)
    # keep_ref doubles as the accumulator: earlier blocks' decisions are
    # final by the time later blocks read them (static-slice stores only —
    # Mosaic has no dynamic_update_slice lowering)
    keep_ref[:] = jnp.zeros((1, 8, m), jnp.float32)
    passes_ref[:] = jnp.zeros((1, 8, 128), jnp.float32)

    for t in range(nb):                                 # static unroll
        start = t * bsz
        x1r = rows[0:1, start:start + bsz]              # (1, B) block rows
        y1r = rows[1:2, start:start + bsz]
        x2r = rows[2:3, start:start + bsz]
        y2r = rows[3:4, start:start + bsz]
        scr = rows[4:5, start:start + bsz]
        arear = rows[5:6, start:start + bsz]
        xx1 = jnp.maximum(x1c, x1r)                     # (m, B)
        yy1 = jnp.maximum(y1c, y1r)
        xx2 = jnp.minimum(x2c, x2r)
        yy2 = jnp.minimum(y2c, y2r)
        inter = (jnp.maximum(0.0, xx2 - xx1 + 1.0)
                 * jnp.maximum(0.0, yy2 - yy1 + 1.0))
        if min_method:
            denom = jnp.minimum(areac, arear)
        else:
            denom = areac + arear - inter
        o = inter / denom
        # suppr[i, j]: sorted row i (global) suppresses block col j
        # (global start+j); strict upper triangle = i before j in score
        # order. 0/1 f32 so `any over i` becomes an MXU matvec.
        tri = row_ids < (col_ids + start)
        supf = jnp.where((o > threshold) & tri & jnp.isfinite(o), 1.0, 0.0)
        # earlier blocks' decisions in keep_ref are FINAL; this/later
        # blocks are still 0 there, so `pre` counts exactly the final
        # prefix
        pre = jnp.dot(keep_ref[0, 0:1, :], supf,
                      preferred_element_type=jnp.float32)
        sub = jax.lax.slice(supf, (start, 0), (start + bsz, bsz))  # (B, B)
        vblk = jnp.isfinite(scr) & (pre == 0.0)         # (1, B)

        def istep(kb, vblk=vblk, sub=sub):
            hit = jnp.dot(kb, sub, preferred_element_type=jnp.float32)
            return jnp.where(vblk & (hit == 0.0), 1.0, 0.0)

        kb0 = jnp.where(vblk, 1.0, 0.0)
        kb1 = istep(kb0)

        def icond(st):
            kb, prev, it = st
            return jnp.any(kb != prev) & (it < bsz)

        def ibody(st):
            kb, _, it = st
            return istep(kb), kb, it + 1

        kb, _, it = jax.lax.while_loop(
            icond, ibody, (kb1, kb0, jnp.ones((), jnp.int32)))
        keep_ref[0, :, start:start + bsz] = jnp.broadcast_to(kb, (8, bsz))
        passes_ref[0, :, t:t + 1] = jnp.full((8, 1), 1.0) * it.astype(
            jnp.float32)


def nms_mask_pallas_batched(boxes: jnp.ndarray, threshold: float,
                            method: str = "Union", block: int = 128,
                            interpret: bool | None = None,
                            return_passes: bool = False):
    """Batched one-dispatch NMS: boxes [S, N, 5] -> keep mask [S, N] bool
    (original row order). Each batch element is one grid program. ``block``
    is rounded up to a lane-aligned (multiple of 128) Gauss-Seidel block."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    s_dim, n, _ = boxes.shape
    sc0 = boxes[..., 4]
    # descending score, ties broken by HIGHEST original index — the
    # oracle's pop-from-end-of-ascending-argsort rule (oracles.py::nms)
    order = n - 1 - jnp.argsort(-sc0[:, ::-1], axis=-1, stable=True)
    b = jnp.take_along_axis(boxes, order[..., None], axis=1)
    bsz = max(128, -(-int(block) // 128) * 128)
    m = -(-n // bsz) * bsz
    pad = m - n
    coords = b[..., :4].astype(jnp.float32)
    score = b[..., 4].astype(jnp.float32)
    if pad:
        coords = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
        score = jnp.pad(score, ((0, 0), (0, pad)),
                        constant_values=-jnp.inf)
    area = ((coords[..., 2] - coords[..., 0] + 1.0)
            * (coords[..., 3] - coords[..., 1] + 1.0))
    zeros = jnp.zeros_like(score)
    rows = jnp.stack([coords[..., 0], coords[..., 1], coords[..., 2],
                      coords[..., 3], score, area, zeros, zeros],
                     axis=1)                            # [S, 8, m]
    cols = jnp.swapaxes(rows, 1, 2)                     # [S, m, 8]
    nb = m // bsz
    assert nb <= 128, f"too many Gauss-Seidel blocks ({nb}) for one lane row"
    kern = functools.partial(_nms_kernel, nb=nb, bsz=bsz, m=m,
                             threshold=float(threshold),
                             min_method=(method == "Min"))
    keep_s, passes = pl.pallas_call(
        kern,
        grid=(s_dim,),
        out_shape=(jax.ShapeDtypeStruct((s_dim, 8, m), jnp.float32),
                   jax.ShapeDtypeStruct((s_dim, 8, 128), jnp.float32)),
        in_specs=[pl.BlockSpec((1, 8, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, m, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 8, m), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(rows, cols)
    mask = jnp.zeros((s_dim, n), bool).at[
        jnp.arange(s_dim)[:, None], order].set(keep_s[:, 0, :n] > 0.5)
    if return_passes:
        return mask, passes[:, 0, :nb].astype(jnp.int32)
    return mask


def nms_mask_pallas(boxes: jnp.ndarray, threshold: float,
                    method: str = "Union", block: int = 128,
                    interpret: bool | None = None,
                    return_passes: bool = False):
    """Single-frame variant: boxes [N, 5] -> keep mask [N] bool."""
    out = nms_mask_pallas_batched(boxes[None], threshold, method,
                                  block=block, interpret=interpret,
                                  return_passes=return_passes)
    if return_passes:
        return out[0][0], out[1][0]
    return out[0]
