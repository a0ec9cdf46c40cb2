"""68-point ERT shape regression (reference C16, MTCNN_Dlib_Detection
contract): trainer learns, cascade refines beyond the init, 5-point affine
seeding beats the raw mean shape, save/load roundtrip, fusion contract."""

import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.detect.ert import (
    CascadeLevel,
    ShapePredictor,
    five_points_from_68,
    train_shape_predictor,
)

L = 68
SIZE = 64


def _canonical_shape() -> np.ndarray:
    """A synthetic 68-point face layout in the unit square: jaw arc, brows,
    eyes, nose, mouth — positions chosen so five_points_from_68 lands on
    sensible spots."""
    pts = np.zeros((L, 2), np.float32)
    t = np.linspace(0, np.pi, 17)
    pts[0:17] = np.stack([0.5 - 0.45 * np.cos(t), 0.35 + 0.55 * np.sin(t)],
                         1)  # jaw
    for i in range(5):  # brows
        pts[17 + i] = [0.2 + 0.1 * i, 0.25]
        pts[22 + i] = [0.55 + 0.1 * i, 0.25]
    pts[27:31] = np.stack([np.full(4, 0.5), np.linspace(0.3, 0.5, 4)], 1)
    pts[31:36] = np.stack([np.linspace(0.42, 0.58, 5), np.full(5, 0.55)], 1)
    th = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    pts[36:42] = np.stack([0.3 + 0.06 * np.cos(th), 0.35 + 0.03 * np.sin(th)],
                          1)  # left eye
    pts[42:48] = np.stack([0.7 + 0.06 * np.cos(th), 0.35 + 0.03 * np.sin(th)],
                          1)  # right eye
    th2 = np.linspace(0, 2 * np.pi, 20, endpoint=False)
    pts[48:68] = np.stack([0.5 + 0.12 * np.cos(th2),
                           0.75 + 0.05 * np.sin(th2)], 1)  # mouth
    return pts


def _render(shape_img: np.ndarray) -> np.ndarray:
    """Landmark-dependent image: bright gaussian blobs at eye/nose/mouth
    keypoints over noise, so pixel differences carry shape information."""
    img = np.zeros((SIZE, SIZE), np.float32)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    keys = five_points_from_68(shape_img)
    for kx, ky in keys:
        img += 255.0 * np.exp(-((xx - kx) ** 2 + (yy - ky) ** 2) / (2 * 3 ** 2))
    return np.clip(img, 0, 255)


def _dataset(n, seed):
    """Faces at random scale/position with SLOPPY detection rects (shifted
    and rescaled) — the realistic regime where the cascade must recover the
    true shape from pixels rather than pass the init through."""
    rng = np.random.default_rng(seed)
    canon = _canonical_shape()
    images, rects, shapes = [], [], []
    for _ in range(n):
        scale = rng.uniform(0.65, 0.85) * (SIZE - 8)
        tx = rng.uniform(2, SIZE - scale - 2)
        ty = rng.uniform(2, SIZE - scale - 2)
        jitter = canon + rng.normal(0, 0.01, canon.shape).astype(np.float32)
        shape_img = jitter * scale + [tx, ty]
        images.append(_render(shape_img))
        # detector-style rect: shifted up to 10% and rescaled 0.95-1.2x
        cx, cy = tx + scale / 2, ty + scale / 2
        s2 = scale * rng.uniform(0.95, 1.2)
        cx += rng.uniform(-0.1, 0.1) * scale
        cy += rng.uniform(-0.1, 0.1) * scale
        rects.append([cx - s2 / 2, cy - s2 / 2, cx + s2 / 2, cy + s2 / 2])
        shapes.append(shape_img)
    return images, np.asarray(rects, np.float32), np.asarray(shapes,
                                                             np.float32)


@pytest.fixture(scope="module")
def trained():
    images, rects, shapes = _dataset(60, seed=0)
    pred = train_shape_predictor(
        images, rects, shapes, cascades=4, trees_per_cascade=40,
        tree_depth=3, feature_pool=150, n_split_candidates=20, nu=0.3,
        oversampling=3, seed=0)
    return pred


def _mean_err(pred, images, rects, shapes, seeded_fives=None):
    errs = []
    for i, img in enumerate(images):
        init = None
        if seeded_fives is not None:
            init = pred.init_shape_from_5pt(seeded_fives[i], rects[i])
        out = pred.predict(img, rects[i], init)
        w = rects[i][2] - rects[i][0]
        errs.append(np.linalg.norm(out - shapes[i], axis=1).mean() / w)
    return float(np.mean(errs))


def test_cascade_refines_beyond_init(trained):
    """Held-out error after the cascade < error of the raw mean-shape init
    (the ERT is actually learning, not passing the init through)."""
    images, rects, shapes = _dataset(20, seed=99)
    init_pred = ShapePredictor(mean_shape=trained.mean_shape)  # 0 levels
    err_init = _mean_err(init_pred, images, rects, shapes)
    err_ert = _mean_err(trained, images, rects, shapes)
    assert err_ert < 0.75 * err_init, (err_ert, err_init)


def test_five_point_seeding_beats_mean_shape(trained):
    """MTCNN-5pt affine seeding (MTCNN.hpp:1391-1396 flow): with a shifted/
    scaled detection rect, the seeded init lands closer than the mean
    shape."""
    images, rects, shapes = _dataset(12, seed=7)
    # detection rects are sloppy: shift + scale them
    rng = np.random.default_rng(1)
    bad_rects = rects.copy()
    wh = rects[:, 2:4] - rects[:, 0:2]
    bad_rects[:, 0:2] += rng.uniform(-0.12, 0.12, (12, 2)) * wh
    bad_rects[:, 2:4] += rng.uniform(-0.12, 0.12, (12, 2)) * wh
    fives = np.stack([five_points_from_68(s) for s in shapes])

    seed_err, mean_err = [], []
    for i in range(len(images)):
        w = bad_rects[i][2] - bad_rects[i][0]
        init = trained.init_shape_from_5pt(fives[i], bad_rects[i])
        init_img = init * [w, bad_rects[i][3] - bad_rects[i][1]] + \
            bad_rects[i][0:2]
        mean_img = trained.mean_shape * \
            [w, bad_rects[i][3] - bad_rects[i][1]] + bad_rects[i][0:2]
        seed_err.append(np.linalg.norm(init_img - shapes[i], axis=1).mean())
        mean_err.append(np.linalg.norm(mean_img - shapes[i], axis=1).mean())
    assert np.mean(seed_err) < 0.5 * np.mean(mean_err)


def test_save_load_roundtrip(trained, tmp_path):
    p = str(tmp_path / "sp.npz")
    trained.save(p)
    loaded = ShapePredictor.load(p)
    images, rects, shapes = _dataset(3, seed=5)
    for i in range(3):
        np.testing.assert_allclose(trained.predict(images[i], rects[i]),
                                   loaded.predict(images[i], rects[i]),
                                   rtol=1e-6)


def test_predict_output_contract(trained):
    """predict returns [68, 2] image-space float coords inside a sane
    neighborhood of the rect (part(j).x()/y() contract)."""
    images, rects, _ = _dataset(1, seed=11)
    out = trained.predict(images[0], rects[0])
    assert out.shape == (L, 2) and out.dtype == np.float32
    x1, y1, x2, y2 = rects[0]
    w = x2 - x1
    assert (out[:, 0] > x1 - w).all() and (out[:, 0] < x2 + w).all()


def test_traverse_matches_manual_tree():
    """Vectorized heap traversal == hand-walked tree."""
    rng = np.random.default_rng(0)
    depth, k = 2, 3
    level = CascadeLevel(
        anchors=np.zeros(8, np.int64), deltas=np.zeros((8, 2), np.float32),
        split_idx1=rng.integers(0, 8, (k, 3)),
        split_idx2=rng.integers(0, 8, (k, 3)),
        split_thresh=rng.normal(size=(k, 3)).astype(np.float32),
        leaf_values=rng.normal(size=(k, 4, 4)).astype(np.float32),
    )
    feats = rng.normal(size=8).astype(np.float32) * 10
    got = ShapePredictor._traverse(feats, level)
    want = np.zeros(4, np.float32)
    for t in range(k):
        node = 0
        for _ in range(depth):
            go_left = (feats[level.split_idx1[t, node]]
                       - feats[level.split_idx2[t, node]]) \
                > level.split_thresh[t, node]
            node = 2 * node + (1 if go_left else 2)
        want += level.leaf_values[t, node - 3]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mtcnn_ert_detect_empty_image(trained):
    """Fusion contract: zero detections -> empty (0,4) boxes + (0,68,2)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.ert import (
        mtcnn_ert_detect,
    )

    class _NoFaceDetector:
        def detect(self, img, minsize, thresholds, factor):
            return np.zeros((0, 5), np.float32), np.zeros((10, 0), np.float32)

    boxes, lmk = mtcnn_ert_detect(np.zeros((32, 32, 3), np.uint8), trained,
                                  detector=_NoFaceDetector())
    assert boxes.shape == (0, 4) and lmk.shape == (0, 68, 2)


def test_landmarks68_cli_train_and_detect(tmp_path, trained):
    """CLI surface: train a tiny predictor from an annotations npz, then run
    detect on an image file (MTCNN cascade + ERT refinement)."""
    import cv2

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        landmarks68,
    )

    images, rects, shapes = _dataset(20, seed=42)
    ann = str(tmp_path / "ann.npz")
    np.savez(ann, images=np.asarray(images, np.float32), rects=rects,
             shapes=shapes)
    sp = str(tmp_path / "sp.npz")
    pred = landmarks68.main([
        "train", "--annotations", ann, "--out", sp, "--cascades", "2",
        "--trees", "10", "--depth", "2", "--feature-pool", "50",
        "--oversampling", "2"])
    assert pred.num_points == 68

    img_path = str(tmp_path / "probe.png")
    cv2.imwrite(img_path, images[0].astype(np.uint8))
    out = str(tmp_path / "lmk.jsonl")
    results = landmarks68.main([
        "detect", "--predictor", sp, img_path, "--out", out,
        "--thresholds", "0.2", "0.2", "0.2"])
    assert len(results) == 1
    r = results[0]
    # random-weight MTCNN may or may not fire on the synthetic blob image;
    # the contract is boxes/landmarks lists of matching lengths
    assert len(r["boxes"]) == len(r["landmarks"])
    import os

    assert os.path.exists(out)


def test_batched_features_match_per_sample():
    """The vectorized training-feature gather == the per-sample inference
    path exactly (same transforms, same clipping)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.ert import (
        _batched_features,
    )

    rng = np.random.default_rng(6)
    images, rects, shapes = _dataset(6, seed=6)
    mean = shapes.mean(0)
    mean_n = (mean - rects[0, :2]) / (rects[0, 2] - rects[0, 0])  # rough
    pred = ShapePredictor(mean_shape=np.clip(mean_n, 0, 1).astype(np.float32))
    level = CascadeLevel(
        anchors=rng.integers(0, 68, 50).astype(np.int64),
        deltas=rng.normal(0, 0.05, (50, 2)).astype(np.float32),
        split_idx1=np.zeros((1, 1), np.int64),
        split_idx2=np.zeros((1, 1), np.int64),
        split_thresh=np.zeros((1, 1), np.float32),
        leaf_values=np.zeros((1, 2, 136), np.float32),
    )
    ex_img = np.array([0, 1, 2, 3, 4, 5])
    cur = np.stack([pred.mean_shape + rng.normal(0, 0.02, (68, 2))
                    for _ in range(6)]).astype(np.float32)
    got = _batched_features(pred, images, rects, ex_img, cur, level)
    want = np.stack([
        pred._features(images[i], rects[i], cur[i], level)
        for i in range(6)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
