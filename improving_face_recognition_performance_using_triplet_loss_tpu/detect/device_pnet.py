"""Fused on-device PNet pyramid (stage 1 of MTCNN) — one dispatch per image.

The host pipeline (detect/pipeline.py, mirroring the reference) issues one
PNet call per pyramid scale (~10 per image) plus host NMS between them; on a
tunneled TPU each dispatch pays the link round-trip. This module compiles
the ENTIRE stage 1 — resize, normalize, PNet, fixed-capacity top-k decode,
per-scale NMS, cross-scale NMS — into a single jitted program per image
shape, using the fixed-capacity primitives (`decode_pnet_topk_jax`,
`nms_mask_jax` — the parallel fixed-point NMS) that are oracle-validated
in tests.

Documented deviation: device resize uses ``jax.image.resize`` (bilinear),
not cv2 INTER_AREA, so candidate scores differ slightly from the host path;
geometry/decode semantics are identical. Use the host path when bit-parity
with the facenet cascade matters, the device path for throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mtcnn import pnet_forward
from ..ops.boxes import decode_pnet_topk_jax, nms_mask, nms_mask_batched
from .pipeline import pyramid_scales

_NEG_INF = -jnp.inf


def make_device_stage1(
    params,
    h: int,
    w: int,
    *,
    minsize: int = 20,
    factor: float = 0.709,
    threshold: float = 0.6,
    k_per_scale: int = 128,
    out_cap: int = 256,
    with_counts: bool = False,
    use_pallas_nms: bool | None = None,
):
    """Build a jitted stage-1 for images of shape [h, w, 3].

    Returns fn(image float32 [h, w, 3], 0-255) -> [out_cap, 9] candidates
    (q1 q2 score reg; invalid rows carry score -inf), already through the
    per-scale NMS 0.5 and cross-scale NMS 0.7 of the reference cascade.

    ``with_counts``: the fn additionally returns the number of
    above-threshold candidates DROPPED by the per-scale ``k_per_scale`` caps
    (saturation accounting — the host path is unbounded, so any non-zero
    drop count marks a fidelity gap on crowded frames).
    """
    scales = pyramid_scales(h, w, minsize, factor)

    @jax.jit
    def stage1(img: jnp.ndarray):
        per_scale = []
        dropped = jnp.zeros((), jnp.int32)
        for scale in scales:  # static unroll: shapes differ per scale
            hs = int(np.ceil(h * scale))
            ws = int(np.ceil(w * scale))
            im = jax.image.resize(img, (hs, ws, 3), method="linear")
            im = (im - 127.5) * 0.0078125
            # TF-caffe orientation (detect_face.py:308-312)
            prob, reg = pnet_forward(params,
                                     jnp.transpose(im, (1, 0, 2))[None])
            prob_o = jnp.transpose(prob[0], (1, 0, 2))
            reg_o = jnp.transpose(reg[0], (1, 0, 2))
            n_above = jnp.sum(prob_o[:, :, 1] > threshold).astype(jnp.int32)
            dropped = dropped + jnp.maximum(n_above - k_per_scale, 0)
            cand = decode_pnet_topk_jax(prob_o[:, :, 1], reg_o, scale,
                                        threshold, k_per_scale)
            if cand.shape[0] < k_per_scale:
                # the smallest scales have < k heatmap cells — pad with
                # -inf rows so every scale stacks to [k_per_scale, 9]
                pad = jnp.zeros((k_per_scale - cand.shape[0], 9),
                                cand.dtype).at[:, 4].set(_NEG_INF)
                cand = jnp.concatenate([cand, pad], axis=0)
            per_scale.append(cand)
        # ALL per-scale NMS passes run batched — on TPU as ONE Pallas
        # program per scale-set (grid), elsewhere as the vmapped parallel
        # fixed point; the sequential-scan NMS was the cascade's real
        # bottleneck on TPU (tools/perf_detect_breakdown.py), and the
        # scan+while dispatch overhead of the XLA fixed point was 62% of
        # what remained (round-4 attribution — hence the Pallas kernel)
        stacked = jnp.stack(per_scale)                      # [S, k, 9]
        masks = nms_mask_batched(stacked[:, :, :5], 0.5, "Union",
                                 use_pallas=use_pallas_nms)
        scores = jnp.where(masks, stacked[:, :, 4], _NEG_INF)
        stacked = stacked.at[:, :, 4].set(scores)
        allc = stacked.reshape(-1, 9)
        mask = nms_mask(allc[:, :5], 0.7, "Union",
                        use_pallas=use_pallas_nms)
        score = jnp.where(mask, allc[:, 4], _NEG_INF)
        # fixed-capacity output: top out_cap survivors by score (tiny
        # frames can have fewer total candidates than out_cap — pad)
        kk = min(out_cap, score.shape[0])
        top_s, top_i = jax.lax.top_k(score, kk)
        out = allc[top_i].at[:, 4].set(top_s)
        if kk < out_cap:
            pad = jnp.zeros((out_cap - kk, 9), out.dtype).at[:, 4].set(
                _NEG_INF)
            out = jnp.concatenate([out, pad], axis=0)
        if with_counts:
            return out, dropped
        return out

    return stage1
