"""Detection capacity accounting + device-vs-host resize parity
quantification (VERDICT round-1 item 8 / weak #1, #2)."""

import warnings

import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.detect import (
    MTCNNDetector,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.detect.device_cascade import (
    DeviceCascade,
)


def _texture(size, seed, base=12):
    import cv2

    rng = np.random.default_rng(seed)
    b = (rng.random((base, base, 3)) * 255).astype(np.uint8)
    return cv2.resize(b, (size, size), interpolation=cv2.INTER_CUBIC)


# ------------------------------------------------------------- saturation

def test_cascade_reports_zero_drops_when_uncrowded():
    det = MTCNNDetector(seed=2)
    cascade = DeviceCascade(det, thresholds=(0.6, 0.6, 0.6))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any saturation warning = failure
        cascade.detect(_texture(72, seed=1))
    stats = cascade.last_stats
    assert stats is not None
    assert stats["stage1_k_dropped"] == 0
    assert stats["stage2_input_dropped"] == 0
    assert stats["stage3_input_dropped"] == 0


def test_cascade_warns_on_capacity_saturation():
    """Tiny caps + permissive thresholds force truncation: the cascade must
    WARN and expose drop counts instead of silently dropping candidates."""
    det = MTCNNDetector(seed=2)
    cascade = DeviceCascade(det, thresholds=(0.05, 0.01, 0.01),
                            stage1_cap=16, stage2_cap=8, out_cap=4)
    img = _texture(96, seed=6)
    with pytest.warns(RuntimeWarning, match="capacity saturation"):
        cascade.detect(img)
    stats = cascade.last_stats
    dropped = (stats["stage1_k_dropped"] + stats["stage2_input_dropped"]
               + stats["stage3_input_dropped"])
    assert dropped > 0, stats


def test_fused_pipeline_exposes_cap_dropped():
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        make_recognition_pipeline,
    )
    import jax

    det = MTCNNDetector(seed=2)
    model = LightCNN9(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32))
    gallery = np.random.default_rng(0).normal(
        size=(4, model.feature_dim)).astype(np.float32)
    pipe = make_recognition_pipeline(
        det, model, variables, gallery, frame_h=72, frame_w=72,
        embed_size=64, thresholds=(0.3, 0.3, 0.3))
    out = pipe(jnp.asarray(_texture(72, seed=3), jnp.float32))
    assert "cap_dropped" in out
    assert int(out["cap_dropped"]) >= 0


# -------------------------------------------- resize parity quantification

def test_device_vs_host_cascade_box_and_score_deltas():
    """Quantify the bilinear-vs-INTER_AREA deviation over a corpus of
    SATURATION-FREE frames (the counters certify no capacity truncation, so
    any residual delta is purely the resize method): host detections must
    have device matches at IoU > 0.6 with scores within 0.15 (VERDICT weak
    #2 — numbers recorded in docs/DESIGN.md)."""
    det = MTCNNDetector(seed=4)
    cascade = DeviceCascade(det, thresholds=(0.3, 0.25, 0.2),
                            stage1_cap=512, stage2_cap=512, out_cap=256,
                            k_per_scale=1024)

    def iou(a, b):
        x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
        x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
        inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
        area = ((a[2] - a[0]) * (a[3] - a[1])
                + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(area, 1e-9)

    # detections whose ONet score clears the final threshold by this margin
    # are "confident"; borderline ones legitimately flip when the resize
    # kernel changes (bilinear vs INTER_AREA) and are reported, not asserted
    margin = 0.05
    th = (0.3, 0.25, 0.2)
    total = {"all": 0, "confident": 0}
    matched = {"all": 0, "confident": 0}
    score_deltas, ious = [], []
    for seed in range(6):
        img = _texture(88, seed=seed)
        host_boxes, _ = det.detect(img, 20, th, 0.709)
        dev_boxes, _ = cascade.detect(img)
        s = cascade.last_stats
        assert (s["stage1_k_dropped"] + s["stage2_input_dropped"]
                + s["stage3_input_dropped"]) == 0, (
            "corpus frame saturated the caps; comparison would be "
            "confounded")
        for hb in host_boxes:
            conf = hb[4] > th[2] + margin
            total["all"] += 1
            total["confident"] += int(conf)
            if dev_boxes.shape[0] == 0:
                continue
            js = [iou(hb, db) for db in dev_boxes]
            j = int(np.argmax(js))
            if js[j] > 0.6:
                matched["all"] += 1
                matched["confident"] += int(conf)
                ious.append(js[j])
                score_deltas.append(abs(hb[4] - dev_boxes[j][4]))
    if total["confident"] == 0:
        pytest.skip("random-weight nets produced no confident detections")
    recall_all = matched["all"] / max(total["all"], 1)
    recall_conf = matched["confident"] / total["confident"]
    mean_iou = float(np.mean(ious)) if ious else 0.0
    mean_dscore = float(np.mean(score_deltas)) if score_deltas else 0.0
    print(f"\nhost->device parity (saturation-free corpus): "
          f"confident recall@0.6IoU {recall_conf:.3f} "
          f"({total['confident']} boxes), all-box recall {recall_all:.3f} "
          f"({total['all']} boxes), mean IoU {mean_iou:.3f}, "
          f"mean |dscore| {mean_dscore:.4f}")
    # random-weight nets on white noise are chaos amplifiers: borderline
    # threshold decisions flip under ANY resize-kernel change, so recall is
    # bounded loosely here; matched-box agreement is the stable quantity
    # (exact corpus numbers recorded in docs/DESIGN.md)
    assert recall_conf >= 0.55, (recall_conf, total["confident"])
    assert mean_iou > 0.8, mean_iou
    assert mean_dscore < 0.05, mean_dscore


def test_multiface_pipeline_identifies_each_face():
    """make_multiface_pipeline: every detected face is embedded and matched
    (the reference runs Feature_Extract_exe + Compare_Face_DB per face,
    Feature.hpp:763-804) — enroll the pipeline's own top-K crops as the
    gallery, rerun, and each face must match its own gallery row."""
    import jax
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.device_cascade import (
        crop_resize_boxes,
        make_device_cascade,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.distances import (
        l2_normalize,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        make_multiface_pipeline,
    )

    det = MTCNNDetector(seed=2)
    model = LightCNN9(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32))
    frame = _texture(72, seed=3).astype(np.float32)
    th = (0.3, 0.3, 0.3)
    K = 4

    # enrollment by decomposition: same cascade -> top-K -> crops -> embed
    cascade = make_device_cascade(det.pnet_params, det.rnet_params,
                                  det.onet_params, 72, 72, thresholds=th)
    boxes, _, _ = cascade(jnp.asarray(frame))
    score = jnp.where(jnp.isfinite(boxes[:, 4]), boxes[:, 4], -jnp.inf)
    top_s, top_i = jax.lax.top_k(score, K)
    n_found = int(np.isfinite(np.asarray(top_s)).sum())
    if n_found == 0:
        pytest.skip("fixture produced no detections")
    sel = np.asarray(boxes)[np.asarray(top_i), :4]
    bxs = np.stack([np.maximum(sel[:, 0] - 8, 0),
                    np.maximum(sel[:, 1] - 8, 0),
                    np.minimum(sel[:, 2] + 8, 72.0),
                    np.minimum(sel[:, 3] + 8, 72.0)], axis=1)
    crops = crop_resize_boxes(jnp.asarray(frame),
                              jnp.asarray(np.nan_to_num(bxs), jnp.float32),
                              64)
    gray = jnp.mean(crops, axis=-1, keepdims=True) / 255.0
    _, feats = model.apply(variables, gray, train=False)
    gallery = np.asarray(l2_normalize(feats))[:n_found]

    pipe = make_multiface_pipeline(det, model, variables, gallery,
                                   frame_h=72, frame_w=72, embed_size=64,
                                   thresholds=th, max_faces=K,
                                   sim_threshold=0.5)
    out = {key: np.asarray(v) for key, v in
           pipe(jnp.asarray(frame, jnp.float32)).items()}
    assert int(out["found"].sum()) == n_found
    for i in range(n_found):
        assert out["indices"][i] == i
        assert out["similarities"][i] > 0.99
    # unfound slots are masked out
    for i in range(n_found, K):
        assert out["indices"][i] == -1


def test_pipeline_embeddings_compose_with_sharded_gallery():
    """The pipelines expose the per-face embeddings, so galleries past one
    chip's HBM re-match via the mesh-sharded matmul matcher — and the
    sharded result equals the pipeline's own in-program match."""
    import jax
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.gallery import (
        match_gallery_sharded,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        make_recognition_pipeline,
    )

    det = MTCNNDetector(seed=2)
    model = LightCNN9(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32))
    rng = np.random.default_rng(0)
    gallery = rng.normal(size=(101, model.feature_dim)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    pipe = make_recognition_pipeline(
        det, model, variables, gallery, frame_h=72, frame_w=72,
        embed_size=64, thresholds=(0.3, 0.3, 0.3), sim_threshold=-1.0)
    out = pipe(jnp.asarray(_texture(72, seed=3), jnp.float32))
    if not bool(out["found"]):
        pytest.skip("fixture produced no detection")
    emb = np.asarray(out["embedding"])[None]
    idx, sim = match_gallery_sharded(gallery, emb, sim_th=-1.0)
    assert int(idx[0]) == int(out["index"])
    np.testing.assert_allclose(sim[0], float(out["similarity"]), atol=1e-5)


def test_stage1_tiny_frame_single_scale():
    """A frame small enough for a 1-2 scale pyramid has fewer total
    candidates than out_cap — the fixed-capacity output must pad, not
    crash (round-3 regression: top_k(k > n))."""
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.device_pnet import (
        make_device_stage1,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.pipeline import (
        MTCNNDetector,
    )

    det = MTCNNDetector(seed=0)
    for size in (24, 32):
        s1 = make_device_stage1(det.pnet_params, size, size, threshold=0.3,
                                with_counts=True)
        rng = np.random.default_rng(0)
        out, dropped = s1(jnp.asarray(
            rng.uniform(0, 255, (size, size, 3)), jnp.float32))
        assert out.shape == (256, 9)
        assert int(dropped) >= 0
        scores = np.asarray(out)[:, 4]
        # padded rows are -inf; finite rows are genuine candidates
        assert np.isfinite(scores).sum() < 256
