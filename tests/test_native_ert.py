"""Native ERT shape regression (cpp/include/facejax/ert.hpp): the
landmark-refinement half of MTCNN_Dlib_Detection (MTCNN.hpp:1326-1421)
running from an export_ert .npz with zero Python compute — asserted against
detect/ert.py::ShapePredictor.predict, plus the one-call combined
detect+refine flow."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from improving_face_recognition_performance_using_triplet_loss_tpu.detect.ert import (  # noqa: E402
    ShapePredictor,
    five_points_from_68,
    train_shape_predictor,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (  # noqa: E402
    export_ert,
    export_mtcnn,
)

L = 68
SIZE = 64


def _native():
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )

    try:
        native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native unavailable: {e}")
    return native


def _canonical_shape() -> np.ndarray:
    pts = np.zeros((L, 2), np.float32)
    t = np.linspace(0, np.pi, 17)
    pts[0:17] = np.stack([0.5 - 0.45 * np.cos(t), 0.35 + 0.55 * np.sin(t)], 1)
    for i in range(5):
        pts[17 + i] = [0.2 + 0.1 * i, 0.25]
        pts[22 + i] = [0.55 + 0.1 * i, 0.25]
    pts[27:31] = np.stack([np.full(4, 0.5), np.linspace(0.3, 0.5, 4)], 1)
    pts[31:36] = np.stack([np.linspace(0.42, 0.58, 5), np.full(5, 0.55)], 1)
    th = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    pts[36:42] = np.stack([0.3 + 0.06 * np.cos(th),
                           0.35 + 0.03 * np.sin(th)], 1)
    pts[42:48] = np.stack([0.7 + 0.06 * np.cos(th),
                           0.35 + 0.03 * np.sin(th)], 1)
    th2 = np.linspace(0, 2 * np.pi, 20, endpoint=False)
    pts[48:68] = np.stack([0.5 + 0.12 * np.cos(th2),
                           0.75 + 0.05 * np.sin(th2)], 1)
    return pts


def _render(shape_img: np.ndarray) -> np.ndarray:
    img = np.zeros((SIZE, SIZE), np.float32)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    for kx, ky in five_points_from_68(shape_img):
        img += 255.0 * np.exp(
            -((xx - kx) ** 2 + (yy - ky) ** 2) / (2 * 3 ** 2))
    return np.clip(img, 0, 255)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A small trained predictor + its native export."""
    rng = np.random.default_rng(0)
    canon = _canonical_shape()
    images, rects, shapes = [], [], []
    for _ in range(30):
        scale = rng.uniform(0.65, 0.85) * (SIZE - 8)
        tx = rng.uniform(2, SIZE - scale - 2)
        ty = rng.uniform(2, SIZE - scale - 2)
        shape_img = (canon + rng.normal(0, 0.01, canon.shape)
                     .astype(np.float32)) * scale + [tx, ty]
        images.append(_render(shape_img))
        cx, cy = tx + scale / 2, ty + scale / 2
        s2 = scale * rng.uniform(0.95, 1.15)
        rects.append([cx - s2 / 2, cy - s2 / 2, cx + s2 / 2, cy + s2 / 2])
        shapes.append(shape_img)
    pred = train_shape_predictor(
        images, np.asarray(rects, np.float32),
        np.asarray(shapes, np.float32), cascades=3, trees_per_cascade=25,
        tree_depth=3, feature_pool=120, n_split_candidates=15, nu=0.3,
        oversampling=2, seed=0)
    npz = str(tmp_path_factory.mktemp("ert") / "ert.npz")
    export_ert(npz, pred)
    return pred, npz, images, np.asarray(rects, np.float32), shapes


def test_native_predict_matches_python(trained):
    """Mean-shape init AND 5pt-seeded init: the native regressor reproduces
    ShapePredictor.predict on trained weights (same tree paths, same
    landmarks to float tolerance)."""
    native = _native()
    pred, npz, images, rects, shapes = trained
    with native.NativeErt(npz) as ert:
        assert ert.num_points == L
        for i in range(6):
            want = pred.predict(images[i], rects[i])
            got = ert.predict(images[i], rects[i])
            np.testing.assert_allclose(got, want, atol=1e-3)
            five = five_points_from_68(np.asarray(shapes[i]))
            init = pred.init_shape_from_5pt(five, rects[i])
            want_s = pred.predict(images[i], rects[i], init)
            got_s = ert.predict(images[i], rects[i], five_xy=five)
            np.testing.assert_allclose(got_s, want_s, atol=1e-3)


def test_native_seeding_transform_matches_umeyama(trained):
    """The closed-form 2-D Procrustes in C++ equals the SVD Umeyama of
    detect/landmarks.py for non-degenerate 5-point sets (through the full
    init-shape computation)."""
    native = _native()
    pred, npz, images, rects, shapes = trained
    rng = np.random.default_rng(5)
    with native.NativeErt(npz) as ert:
        for _ in range(5):
            five = (five_points_from_68(pred.mean_shape)
                    * rng.uniform(20, 40) + rng.uniform(0, 10, (1, 2)))
            rect = np.asarray([0.0, 0.0, 48.0, 48.0], np.float32)
            img = np.zeros((SIZE, SIZE), np.float32)
            # 0-level predictor isolates the init: output = init * wh + xy
            empty = ShapePredictor(mean_shape=pred.mean_shape)
            want = empty.predict(img, rect,
                                 empty.init_shape_from_5pt(five, rect))
            npz0 = npz.replace("ert.npz", "ert0.npz")
            export_ert(npz0, empty)
            with native.NativeErt(npz0) as e0:
                got = e0.predict(img, rect, five_xy=five)
            np.testing.assert_allclose(got, want, atol=1e-3)


def test_combined_native_detect_refine(trained, tmp_path):
    """fx_mtcnn_ert_detect (one native call) equals native detect followed
    by native per-face seeded predict — the MTCNN_Dlib_Detection contract
    (boxes [N, 4], landmarks [N, 68, 2]) with zero Python in the loop."""
    native = _native()
    pred, npz, images, rects, shapes = trained

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        mtcnn as nets,
    )

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mtcnn_npz = str(tmp_path / "mtcnn.npz")
    export_mtcnn(mtcnn_npz, nets.init_pnet_params(k1),
                 nets.init_rnet_params(k2), nets.init_onet_params(k3))

    rng = np.random.default_rng(42)
    base = rng.uniform(40, 210, (9, 12, 3))
    frame = np.kron(base, np.ones((8, 8, 1))).astype(np.float32)
    th = (0.45, 0.35, 0.3)

    with native.NativeMtcnn(mtcnn_npz) as det, native.NativeErt(npz) as ert:
        boxes, lmk = native.native_mtcnn_ert_detect(det, ert, frame,
                                                    thresholds=th)
        assert boxes.shape[0] > 0
        assert lmk.shape == (boxes.shape[0], L, 2)
        # decomposition equality: manual per-face seeded predict
        raw_boxes, raw_pts = det.detect(frame, thresholds=th)
        gray = frame.mean(-1)
        for i in range(boxes.shape[0]):
            np.testing.assert_allclose(boxes[i], raw_boxes[i, :4], atol=1e-4)
            five = np.stack([raw_pts[:5, i], raw_pts[5:, i]], axis=1)
            manual = ert.predict(gray, raw_boxes[i, :4], five_xy=five)
            np.testing.assert_allclose(lmk[i], manual, atol=1e-3)


def test_landmarks68_cli_export_native(tmp_path):
    """landmarks68 train --export-native writes an npz the native regressor
    opens."""
    native = _native()
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        landmarks68,
    )

    rng = np.random.default_rng(0)
    canon = _canonical_shape()
    images, rects, shapes = [], [], []
    for _ in range(6):
        s = canon * 40 + 10
        images.append(_render(s))
        rects.append([10, 10, 50, 50])
        shapes.append(s)
    ann = str(tmp_path / "ann.npz")
    np.savez(ann, images=np.stack(images),
             rects=np.asarray(rects, np.float32),
             shapes=np.asarray(shapes, np.float32))
    out = str(tmp_path / "pred.npz")
    native_out = str(tmp_path / "pred_native.npz")
    landmarks68.main(["train", "--annotations", ann, "--out", out,
                      "--cascades", "1", "--trees", "3", "--depth", "2",
                      "--feature-pool", "30", "--oversampling", "1",
                      "--export-native", native_out])
    with native.NativeErt(native_out) as ert:
        assert ert.num_points == L


def test_align_cli_export_native_mtcnn(tmp_path):
    """align --export-native-mtcnn writes an npz the native cascade opens
    (even with an empty input tree)."""
    native = _native()
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        align,
    )

    (tmp_path / "in").mkdir()
    npz = str(tmp_path / "mtcnn.npz")
    align.main([str(tmp_path / "in"), str(tmp_path / "out"),
                "--export-native-mtcnn", npz])
    with native.NativeMtcnn(npz) as det:
        boxes, pts = det.detect(
            np.zeros((32, 32), np.float32), thresholds=(0.99, 0.9, 0.9))
    assert boxes.shape == (0, 5)


def test_native_predict_edge_rects(trained):
    """Rects partially outside the image, degenerate-width rects, and
    negative origins: pixel clipping keeps both implementations in lockstep
    (no crash, same landmarks)."""
    native = _native()
    pred, npz, images, rects, shapes = trained
    img = images[0]
    edge_rects = [
        [-10.0, -10.0, 30.0, 30.0],          # spills over the top-left
        [40.0, 40.0, 200.0, 200.0],          # spills past the bottom-right
        [10.0, 10.0, 10.0, 10.0],            # zero-size (1e-6 floor)
        [50.0, -5.0, 90.0, 70.0],            # tall, partially outside
    ]
    with native.NativeErt(npz) as ert:
        for rect in edge_rects:
            want = pred.predict(img, np.asarray(rect, np.float32))
            got = ert.predict(img, np.asarray(rect, np.float32))
            assert np.isfinite(got).all(), rect
            np.testing.assert_allclose(got, want, atol=1e-2, err_msg=str(rect))
