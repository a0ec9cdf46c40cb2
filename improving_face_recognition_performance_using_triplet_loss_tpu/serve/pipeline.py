"""End-to-end fused recognition pipeline: detect -> crop -> embed -> match.

The reference's serving path (SURVEY.md §3.4) crosses the host/device
boundary dozens of times per frame: per-scale PNet calls, host NMS, crop
loops, the embedding forward, then the CPU gallery scan. Here the ENTIRE
identification pass — MTCNN cascade, best-face selection, grayscale
crop-resize to the embedding input, the embedding net, L2 normalization,
and the cosine gallery argmax — compiles into ONE XLA program per frame
shape. On the tunneled single chip that is one ~60 ms link round-trip
instead of dozens; on directly-attached hardware it is the speed-of-light
serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..detect.device_cascade import crop_resize_boxes, make_device_cascade
from ..ops.distances import (gallery_sims,  # noqa: F401 (public re-export)
                             l2_normalize, l2_normalize_np,
                             narrow_gallery_np)


def _apply_embed(model, variables, x, int8_embed: bool):
    """The embed stage, optionally on the int8 MXU path: every eligible
    conv rerouted through ops/quantized.py's generic interceptor (the
    dense tail and the K=25 stem stay in the model's compute dtype)."""
    if int8_embed:
        import flax.linen as nn

        from ..ops.quantized import int8_conv_interceptor

        with nn.intercept_methods(int8_conv_interceptor()):
            return model.apply(variables, x, train=False)
    return model.apply(variables, x, train=False)


def _match_gallery(sims: jnp.ndarray, rows):
    """Masked cosine argmax over the last (gallery) axis. NaNs map to -2.0
    (Compare_Face_From_DB's guard, Feature.hpp:312-317); when ``rows`` is
    given, columns >= rows are masked to -inf so padding rows can NEVER win
    — even when every real similarity is negative. Returns
    ``(idx, sim, real)`` with ``real`` False where every column is masked
    (rows == 0, the empty-DB case) so callers keep the -2.0 sentinel
    instead of leaking -inf."""
    sims = jnp.where(jnp.isnan(sims), -2.0, sims)
    if rows is not None:
        valid = jnp.arange(sims.shape[-1]) < rows
        sims = jnp.where(valid, sims, -jnp.inf)
    idx = jnp.argmax(sims, axis=-1)
    sim = jnp.max(sims, axis=-1)
    return idx, sim, sim > -jnp.inf


def _make_detect_embed(detector, embed_model, embed_variables, *, frame_h,
                       frame_w, embed_size, margin, minsize, thresholds,
                       int8_embed):
    """The gallery-independent front of the fused pipeline: cascade ->
    largest-centered selection -> margin crop -> grayscale resize -> embed
    -> L2 norm. Returns fn(frame) -> (found, box, score, emb, cap_dropped).
    Shared by the baked/dynamic pipelines and the gallery-sharded mesh
    variant (which matches the embedding against sharded gallery rows)."""
    cascade = make_device_cascade(
        detector.pnet_params, detector.rnet_params, detector.onet_params,
        frame_h, frame_w, minsize=minsize, thresholds=thresholds)

    def detect_embed(frame: jnp.ndarray):
        boxes, _, counts = cascade(frame)             # [cap, 5]
        valid = jnp.isfinite(boxes[:, 4])
        found = jnp.any(valid)
        # largest-centered selection (area - 2 * center offset^2)
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5 - frame_w / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5 - frame_h / 2.0
        rank = jnp.where(valid, area - 2.0 * (cx * cx + cy * cy), -jnp.inf)
        best = jnp.argmax(rank)
        box = boxes[best, :4]
        # margin pad + clip (crop_face semantics, align_dataset_mtcnn:99-107)
        box = jnp.stack([
            jnp.maximum(box[0] - margin / 2, 0.0),
            jnp.maximum(box[1] - margin / 2, 0.0),
            jnp.minimum(box[2] + margin / 2, float(frame_w)),
            jnp.minimum(box[3] + margin / 2, float(frame_h)),
        ])
        crop = crop_resize_boxes(frame, box[None], embed_size)[0]
        gray = jnp.mean(crop, axis=-1, keepdims=True) / 255.0  # 1/255 scale
        _, feat = _apply_embed(embed_model, embed_variables, gray[None],
                               int8_embed)
        emb = l2_normalize(feat)[0]
        cap_dropped = counts[0] + counts[1] + counts[2]
        return found, box, boxes[best, 4], emb, cap_dropped

    return detect_embed


def make_recognition_pipeline(
    detector,
    embed_model,
    embed_variables,
    gallery: np.ndarray,
    *,
    frame_h: int,
    frame_w: int,
    embed_size: int = 128,
    margin: int = 16,
    minsize: int = 20,
    thresholds=(0.6, 0.7, 0.7),
    sim_threshold: float = 0.5,
    int8_embed: bool = False,
    dynamic_gallery: bool = False,
    _jit: bool = True,
):
    """Build the fused pipeline for frames of [frame_h, frame_w, 3] (0-255).

    Returns fn(frame) -> dict with ``found`` (bool), ``box`` [4], ``score``
    (face prob), ``index`` (gallery row, -1 below threshold), ``similarity``.
    Selection rule: largest-centered detection, the alignment CLI's rule
    (align_dataset_mtcnn.py:86-95).

    ``dynamic_gallery=True`` returns fn(frame, gallery_n[, rows]) instead:
    the L2-NORMALIZED gallery ([G, D] f32, see :func:`normalize_gallery`)
    is a runtime argument, so enrollments update the identity DB WITHOUT
    retracing, and million-row galleries never pass through the compiler
    as baked constants (constant-baking a 1.4 GB gallery stalls
    XLA serialization; measured round 3). One compile per gallery SHAPE —
    grow the gallery by doubling + padding rows, passing the enrolled row
    count as ``rows`` so padding is MASKED out of the argmax. Omitting
    ``rows`` treats every row as enrolled; zero padding rows then cosine
    to 0 and can only win when every real similarity is negative (safe iff
    ``sim_threshold > 0``).

    ``_jit=False`` returns the untraced body (for
    ``make_multistream_pipeline``'s vmap).
    """
    detect_embed = _make_detect_embed(
        detector, embed_model, embed_variables, frame_h=frame_h,
        frame_w=frame_w, embed_size=embed_size, margin=margin,
        minsize=minsize, thresholds=thresholds, int8_embed=int8_embed)
    baked_gallery_n = (None if dynamic_gallery
                       else l2_normalize(jnp.asarray(gallery, jnp.float32)))

    def pipeline(frame: jnp.ndarray, gallery_n=baked_gallery_n, rows=None):
        found, box, score, emb, cap_dropped = detect_embed(frame)
        idx, sim, real = _match_gallery(gallery_sims(emb, gallery_n), rows)
        matched = found & real & (sim >= sim_threshold)
        return {
            "found": found,
            "box": box,
            "score": score,
            "index": jnp.where(matched, idx, -1).astype(jnp.int32),
            "similarity": jnp.where(found & real, sim, -2.0),
            # the L2-normalized face embedding — lets callers re-match
            # against galleries too large for one chip via
            # serve.gallery.match_gallery_sharded (mesh-sharded matmul)
            "embedding": emb,
            # candidates dropped by the cascade's fixed caps this frame
            # (no-silent-caps accounting; 0 on uncrowded frames)
            "cap_dropped": cap_dropped,
        }

    return jax.jit(pipeline) if _jit else pipeline


def normalize_gallery(gallery: np.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Gallery rows -> the L2-normalized [G, D] device array the
    ``dynamic_gallery`` pipelines take at call time.

    ``dtype=jnp.bfloat16`` halves the gallery's HBM bytes — and the match
    stage at production scale is bandwidth-bound at ~100% of the f32
    roofline (BASELINE.md 'Production-scale galleries'), so bf16 buys up
    to 2x on the G-dominated term. Normalization stays f32; only the
    stored rows narrow (~3e-3 cosine error — far under any identification
    threshold gap; argmax parity is pinned in tests/test_fused_pipeline
    .py). The matmul's bf16->f32 widening fuses into the operand read, so
    traffic stays bf16 — and the rows narrow on HOST, so the upload moves
    half the bytes too.

    ``dtype=jnp.int8`` stores ``round(127 * normalized)`` for a QUARTER of
    the f32 bytes — the TPU-side analogue of the native matcher's
    both-operands int8 path (cpp/include/facejax/matcher.hpp):
    :func:`gallery_sims` quantizes the probe to the same grid and runs an
    int8 x int8 int32-accumulated matmul (~4e-3 combined cosine error,
    rescaled by 1/127^2)."""
    return jnp.asarray(narrow_gallery_np(
        l2_normalize_np(np.asarray(gallery, np.float32)), dtype))


def make_multistream_pipeline(
    detector,
    embed_model,
    embed_variables,
    gallery: np.ndarray,
    **kwargs,
):
    """Throughput-mode serving: identify the best face in EVERY frame of a
    same-shape multi-camera batch [N, frame_h, frame_w, 3] as ONE XLA
    program — the TPU-first answer to scaling the reference's
    one-camera-one-process loop (SURVEY.md §3.4, CameraSettings.h:21)
    across streams. vmap maps the per-frame cascade onto batched convs and
    the N embedding forwards onto one [N, S, S, 1] batch, so the MXU sees
    production-sized matmuls instead of N latency-shaped dispatches.

    Accepts ``make_recognition_pipeline``'s keyword config; returns
    fn(frames [N, H, W, 3]) -> the same result dict with a leading N axis
    on every field. N is a trace-time constant per call shape (one compile
    per stream count — keep N fixed per deployment). Pass ``max_faces``
    (> 0) to batch the MULTI-face pipeline instead: every field gains a
    leading N axis over ``make_multiface_pipeline``'s per-face arrays.
    """
    if kwargs.get("max_faces", 0):
        single = make_multiface_pipeline(
            detector, embed_model, embed_variables, gallery, _jit=False,
            **kwargs)
    else:
        kwargs.pop("max_faces", None)
        single = make_recognition_pipeline(
            detector, embed_model, embed_variables, gallery, _jit=False,
            **kwargs)
    if kwargs.get("dynamic_gallery"):
        # fn(frames [N, H, W, 3], gallery_n [G, D][, rows]) — gallery shared
        vm2 = jax.jit(jax.vmap(single, in_axes=(0, None)))
        vm3 = jax.jit(jax.vmap(single, in_axes=(0, None, None)))

        def fn(frames, gallery_n, rows=None):
            return (vm2(frames, gallery_n) if rows is None
                    else vm3(frames, gallery_n, rows))

        return fn
    return jax.jit(jax.vmap(single))


def make_sharded_multistream_pipeline(
    detector,
    embed_model,
    embed_variables,
    gallery: np.ndarray,
    mesh,
    *,
    axis: str = "data",
    **kwargs,
):
    """Multi-stream serving sharded over a device mesh: frames
    [N, H, W, 3] split along the stream axis, weights + gallery replicated
    (the same layout the sharded extractor uses — frames ride ICI only at
    dispatch, every collective-free pipeline runs chip-local). N must be a
    multiple of the mesh axis size.

    This is the serving analogue of `extract.make_sharded_extract_fn`:
    K cameras per chip x D chips in ONE dispatch. Replaces the reference's
    process-per-camera scaling (SURVEY.md §3.4).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    single = make_recognition_pipeline(
        detector, embed_model, embed_variables, gallery, _jit=False,
        **kwargs)
    batched = jax.vmap(single)
    frames_sharding = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, in_shardings=(frames_sharding,),
                       out_shardings=NamedSharding(mesh, P(axis)))
    def pipeline(frames: jnp.ndarray):
        return batched(frames)

    def run(frames):
        n = frames.shape[0]
        d = mesh.shape[axis]
        if n % d != 0:
            raise ValueError(
                f"stream count ({n}) must be a multiple of the mesh "
                f"'{axis}' axis size ({d})")
        return pipeline(jnp.asarray(frames, jnp.float32))

    return run


def shard_gallery(gallery: np.ndarray, mesh, *, gallery_axis: str = "model",
                  dtype=jnp.float32):
    """L2-normalize the gallery on host, zero-pad rows to a
    ``gallery_axis`` multiple, and device_put it sharded [Gpad, D] over the
    mesh. Returns ``(gal_n, rows)`` for
    :func:`make_gallery_sharded_multistream_pipeline`; padding rows are
    masked by ``rows`` inside the pipeline, so (unlike the single-chip
    dynamic-gallery zero-pad contract) they can never win the argmax even
    when every real similarity is negative. Enrollments at a fixed Gpad are
    one re-upload; growth past Gpad re-shards at the next multiple.
    ``dtype=jnp.bfloat16`` halves (``jnp.int8`` quarters, with the
    caveats in :func:`normalize_gallery`) per-shard HBM bytes and
    match-stage bandwidth."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = mesh.shape[gallery_axis]
    g, d = gallery.shape
    gal = l2_normalize_np(gallery)  # l2_normalize's eps semantics
    pad = (-g) % ndev
    if pad:
        gal = np.concatenate([gal, np.zeros((pad, d), np.float32)])
    gal = narrow_gallery_np(gal, dtype)  # narrow BEFORE the transfer
    arr = jax.device_put(gal, NamedSharding(mesh, P(gallery_axis, None)))
    return arr, g


def make_gallery_sharded_multistream_pipeline(
    detector,
    embed_model,
    embed_variables,
    mesh,
    *,
    stream_axis: str = "data",
    gallery_axis: str = "model",
    frame_h: int,
    frame_w: int,
    embed_size: int = 128,
    margin: int = 16,
    minsize: int = 20,
    thresholds=(0.6, 0.7, 0.7),
    sim_threshold: float = 0.5,
    int8_embed: bool = False,
):
    """Serve identity DBs BIGGER than one chip's HBM in ONE dispatch: a 2-D
    mesh shards camera streams over every device for detect+crop+embed
    (frames [N, H, W, 3] split over the flattened mesh — zero redundant
    conv work), and shards GALLERY ROWS over ``gallery_axis`` for the
    match (a 16M x 342 f32 gallery is ~22 GB — over a v5e's 16 GB HBM;
    8-way sharding holds ~2.7 GB/chip). The [N, D] embeddings are tiny, so
    XLA's inserted all_gather to replicate them across gallery shards
    rides ICI for ~N*D*4 bytes; the [N, G] argmax reduces across shards
    with the compiler's collectives (the scaling-book recipe: annotate
    shardings, let XLA place the collectives).

    Call as ``fn(frames, gal_n, rows)`` with ``(gal_n, rows)`` from
    :func:`shard_gallery`; the gallery is a runtime argument (dynamic —
    enrollments never retrace). N must be a multiple of the mesh size.
    Semantics match ``make_multistream_pipeline`` row for row minus the
    ``embedding`` output's sharding layout.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    detect_embed = _make_detect_embed(
        detector, embed_model, embed_variables, frame_h=frame_h,
        frame_w=frame_w, embed_size=embed_size, margin=margin,
        minsize=minsize, thresholds=thresholds, int8_embed=int8_embed)
    batched = jax.vmap(detect_embed)
    frames_spec = NamedSharding(mesh, P((stream_axis, gallery_axis)))
    gal_spec = NamedSharding(mesh, P(gallery_axis, None))

    @functools.partial(jax.jit, in_shardings=(frames_spec, gal_spec, None))
    def pipeline(frames: jnp.ndarray, gal_n: jnp.ndarray, rows):
        found, box, score, emb, cap_dropped = batched(frames)
        # replicate the tiny [N, D] embeddings so every gallery shard
        # scans the full query set (one all_gather over ICI)
        emb = jax.lax.with_sharding_constraint(
            emb, NamedSharding(mesh, P(None, None)))
        # [N, Gpad] sims, G-dim sharded; argmax = cross-shard reduction
        idx, sim, real = _match_gallery(gallery_sims(emb, gal_n), rows)
        matched = found & real & (sim >= sim_threshold)
        return {
            "found": found,
            "box": box,
            "score": score,
            "index": jnp.where(matched, idx, -1).astype(jnp.int32),
            "similarity": jnp.where(found & real, sim, -2.0),
            "embedding": emb,
            "cap_dropped": cap_dropped,
        }

    ndev = mesh.devices.size

    def run(frames, gal_n, rows):
        n = frames.shape[0]
        if n % ndev != 0:
            raise ValueError(
                f"stream count ({n}) must be a multiple of the mesh size "
                f"({ndev}) — frames shard over the whole mesh")
        return pipeline(jnp.asarray(frames, jnp.float32), gal_n, rows)

    return run


def make_multiface_pipeline(
    detector,
    embed_model,
    embed_variables,
    gallery: np.ndarray,
    *,
    frame_h: int,
    frame_w: int,
    embed_size: int = 128,
    margin: int = 16,
    minsize: int = 20,
    thresholds=(0.6, 0.7, 0.7),
    sim_threshold: float = 0.5,
    max_faces: int = 8,
    int8_embed: bool = False,
    dynamic_gallery: bool = False,
    _jit: bool = True,
):
    """Identify EVERY detected face in the frame — the reference's per-frame
    loop runs Feature_Extract_exe + Compare_Face_DB once per detection
    (SURVEY.md §3.4, Feature.hpp:763-804); here the top-``max_faces``
    detections are crop-resized as one batch, embedded as one batch, and
    matched with one gallery matmul, all inside the SAME single XLA program
    as the cascade.

    Returns fn(frame) -> dict of per-face arrays (length ``max_faces``):
    ``found`` (bool mask), ``boxes`` [K, 4], ``scores``, ``indices``
    (gallery row, -1 below threshold/not found), ``similarities``, plus the
    scalar ``cap_dropped`` (cascade-internal capacity drops) and
    ``topk_dropped`` (valid detections beyond ``max_faces``).

    ``dynamic_gallery=True``: fn(frame, gallery_n[, rows]) with the
    normalized gallery as a runtime argument (see
    ``make_recognition_pipeline``).
    """
    if max_faces > 64:  # the cascade's out_cap; no silent truncation
        raise ValueError(
            f"max_faces ({max_faces}) exceeds the device cascade's output "
            "capacity (64) — raise detect.device_cascade caps if you "
            "really need more faces per frame")
    cascade = make_device_cascade(
        detector.pnet_params, detector.rnet_params, detector.onet_params,
        frame_h, frame_w, minsize=minsize, thresholds=thresholds)
    baked_gallery_n = (None if dynamic_gallery
                       else l2_normalize(jnp.asarray(gallery, jnp.float32)))

    def pipeline(frame: jnp.ndarray, gallery_n=baked_gallery_n, rows=None):
        boxes, _, counts = cascade(frame)                 # [cap, 5]
        valid = jnp.isfinite(boxes[:, 4])
        score = jnp.where(valid, boxes[:, 4], -jnp.inf)
        k = min(max_faces, boxes.shape[0])
        top_s, top_i = jax.lax.top_k(score, k)
        found = jnp.isfinite(top_s)
        sel = boxes[top_i, :4]
        # margin pad + clip per face (crop_face semantics); invalid rows
        # carry NaNs that propagate to sims and are masked by `found`
        bxs = jnp.stack([
            jnp.maximum(sel[:, 0] - margin / 2, 0.0),
            jnp.maximum(sel[:, 1] - margin / 2, 0.0),
            jnp.minimum(sel[:, 2] + margin / 2, float(frame_w)),
            jnp.minimum(sel[:, 3] + margin / 2, float(frame_h)),
        ], axis=1)
        safe = jnp.where(jnp.isfinite(bxs), bxs, 0.0)
        crops = crop_resize_boxes(frame, safe, embed_size)  # [K, S, S, 3]
        gray = jnp.mean(crops, axis=-1, keepdims=True) / 255.0
        _, feats = _apply_embed(embed_model, embed_variables, gray,
                                int8_embed)
        embs = l2_normalize(feats)                          # [K, D]
        idx, sim, real = _match_gallery(gallery_sims(embs, gallery_n), rows)  # [K]
        matched = found & real & (sim >= sim_threshold)
        return {
            "found": found,
            "boxes": bxs,
            "scores": top_s,
            "indices": jnp.where(matched, idx, -1).astype(jnp.int32),
            "similarities": jnp.where(found & real, sim, -2.0),
            # per-face L2-normalized embeddings for sharded re-matching
            "embeddings": embs,
            "cap_dropped": counts[0] + counts[1] + counts[2],
            # valid detections the top-k truncation discarded (the cascade
            # found more faces than max_faces) — without this the k-cap
            # would be the one silent truncation in the accounting
            "topk_dropped": jnp.maximum(
                jnp.sum(valid.astype(jnp.int32)) - k, 0),
        }

    return jax.jit(pipeline) if _jit else pipeline
