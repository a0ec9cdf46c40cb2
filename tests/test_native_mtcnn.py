"""Native MTCNN cascade (cpp/include/facejax/mtcnn.hpp): full-frame face
detection with no JAX/Python compute in the loop — reference parity with the
C++ runtime that runs PNet/RNet/ONet itself (MTCNN.hpp:254-1421,
detection_MTCNN :993).

Stage forwards are asserted EXACT against models/mtcnn.py. The full cascade
is asserted against detect/pipeline.py with the host's imresample
monkeypatched to a numpy twin of the native resampler, isolating the one
documented deviation (area/bilinear vs cv2 INTER_AREA) — with resampling
identical, the orchestration must agree box for box and point for point.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from improving_face_recognition_performance_using_triplet_loss_tpu.detect import (  # noqa: E402
    pipeline,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.models import (  # noqa: E402
    mtcnn as nets,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (  # noqa: E402
    export_mtcnn,
)


def _native():
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )

    try:
        native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native unavailable: {e}")
    return native


@pytest.fixture(scope="module")
def mtcnn_setup(tmp_path_factory):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pn = nets.init_pnet_params(k1)
    rn = nets.init_rnet_params(k2)
    on = nets.init_onet_params(k3)
    npz = str(tmp_path_factory.mktemp("mtcnn") / "mtcnn.npz")
    export_mtcnn(npz, pn, rn, on)
    return pn, rn, on, npz


# ---- numpy twins of the native resampler (mtcnn.hpp Resize) ----


def _np_area(img, oh, ow):
    h, w = img.shape[:2]
    img = np.asarray(img, np.float64)
    out = np.zeros((oh, ow) + img.shape[2:], np.float64)
    sy, sx = h / oh, w / ow
    for y in range(oh):
        fy0, fy1 = y * sy, (y + 1) * sy
        iy0, iy1 = int(fy0), min(int(np.ceil(fy1)), h)
        for x in range(ow):
            fx0, fx1 = x * sx, (x + 1) * sx
            ix0, ix1 = int(fx0), min(int(np.ceil(fx1)), w)
            acc = 0.0
            wsum = 0.0
            for iy in range(iy0, iy1):
                wy = min(iy + 1, fy1) - max(iy, fy0)
                for ix in range(ix0, ix1):
                    wx = min(ix + 1, fx1) - max(ix, fx0)
                    acc = acc + wy * wx * img[iy, ix]
                    wsum += wy * wx
            out[y, x] = acc / wsum if wsum > 0 else 0.0
    return out


def _np_bilinear(img, oh, ow):
    h, w = img.shape[:2]
    img = np.asarray(img, np.float64)
    out = np.zeros((oh, ow) + img.shape[2:], np.float64)
    sy, sx = h / oh, w / ow
    for y in range(oh):
        fy = min(max((y + 0.5) * sy - 0.5, 0.0), h - 1)
        y0 = int(fy)
        y1 = min(y0 + 1, h - 1)
        wy = fy - y0
        for x in range(ow):
            fx = min(max((x + 0.5) * sx - 0.5, 0.0), w - 1)
            x0 = int(fx)
            x1 = min(x0 + 1, w - 1)
            wx = fx - x0
            top = (1 - wx) * img[y0, x0] + wx * img[y0, x1]
            bot = (1 - wx) * img[y1, x0] + wx * img[y1, x1]
            out[y, x] = (1 - wy) * top + wy * bot
    return out


def _fake_imresample(img, sz):
    oh, ow = sz
    if oh == img.shape[0] and ow == img.shape[1]:
        return np.asarray(img, np.float64)
    if oh <= img.shape[0] and ow <= img.shape[1]:
        return _np_area(img, oh, ow)
    return _np_bilinear(img, oh, ow)


# ---- stage-level exactness ----


def test_pnet_stage_exact(mtcnn_setup):
    native = _native()
    pn, rn, on, npz = mtcnn_setup
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (30, 40, 3)).astype(np.float32)
    prob, reg = nets.pnet_forward(pn, x[None])
    prob, reg = np.asarray(prob)[0], np.asarray(reg)[0]
    with native.NativeMtcnn(npz) as det:
        out = det.stage_forward(0, x)
    ph, pw = prob.shape[:2]
    np.testing.assert_allclose(out[:ph * pw * 2].reshape(ph, pw, 2), prob,
                               atol=2e-6)
    np.testing.assert_allclose(out[ph * pw * 2:].reshape(ph, pw, 4), reg,
                               atol=2e-6)


def test_rnet_onet_stage_exact(mtcnn_setup):
    native = _native()
    pn, rn, on, npz = mtcnn_setup
    rng = np.random.default_rng(1)
    x24 = rng.uniform(-1, 1, (24, 24, 3)).astype(np.float32)
    x48 = rng.uniform(-1, 1, (48, 48, 3)).astype(np.float32)
    p, r = nets.rnet_forward(rn, x24[None])
    p3, r3, l3 = nets.onet_forward(on, x48[None])
    with native.NativeMtcnn(npz) as det:
        out_r = det.stage_forward(1, x24)
        out_o = det.stage_forward(2, x48)
    np.testing.assert_allclose(out_r[:2], np.asarray(p)[0], atol=2e-6)
    np.testing.assert_allclose(out_r[2:6], np.asarray(r)[0], atol=2e-6)
    np.testing.assert_allclose(out_o[:2], np.asarray(p3)[0], atol=2e-6)
    np.testing.assert_allclose(out_o[2:6], np.asarray(r3)[0], atol=2e-6)
    np.testing.assert_allclose(out_o[6:], np.asarray(l3)[0], atol=2e-6)


# ---- full-cascade parity ----


def test_cascade_matches_host_with_identical_resampling(mtcnn_setup,
                                                        monkeypatch):
    """With the resampling deviation removed, the native cascade must agree
    with detect/pipeline.py box for box (same count, same order, sub-0.1px
    coordinates) and landmark for landmark."""
    native = _native()
    pn, rn, on, npz = mtcnn_setup
    monkeypatch.setattr(pipeline, "imresample", _fake_imresample)
    host = pipeline.MTCNNDetector(pn, rn, on)
    rng = np.random.default_rng(42)
    th = (0.45, 0.35, 0.3)  # random weights need permissive thresholds
    checked_faces = 0
    with native.NativeMtcnn(npz) as det:
        for trial in range(3):
            base = rng.uniform(40, 210, (9, 12, 3))
            img = np.kron(base, np.ones((8, 8, 1))).astype(np.float32)
            hb, hp = host.detect(img, thresholds=th)
            nb, npts = det.detect(img, thresholds=th)
            assert nb.shape[0] == hb.shape[0]
            if hb.shape[0]:
                np.testing.assert_allclose(nb[:, :4], hb[:, :4], atol=0.1)
                np.testing.assert_allclose(nb[:, 4], hb[:, 4], atol=1e-4)
                np.testing.assert_allclose(npts, hp, atol=0.1)
                checked_faces += hb.shape[0]
    assert checked_faces > 0  # the fixture must actually exercise boxes


def test_detect_empty_and_grayscale(mtcnn_setup):
    native = _native()
    pn, rn, on, npz = mtcnn_setup
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (40, 40)).astype(np.float32)  # grayscale 2-D
    with native.NativeMtcnn(npz) as det:
        boxes, pts = det.detect(img, thresholds=(0.999, 0.999, 0.999))
    assert boxes.shape == (0, 5)
    assert pts.shape == (10, 0)


def test_frame_to_identity_no_jax(mtcnn_setup, tmp_path):
    """The reference's full native loop (tmp.cpp manifest: detect -> crop ->
    embed -> match) with zero JAX in the serving path: native MTCNN finds a
    box, the crop goes through the native embedder, and the native identity
    store returns the enrolled name."""
    native = _native()
    pn, rn, on, npz = mtcnn_setup

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_params,
    )

    model = EFMNet342(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32))
    export_dir = str(tmp_path / "export")
    export_params(export_dir, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(64, 64), input_channels=1)

    rng = np.random.default_rng(7)
    base = rng.uniform(40, 210, (9, 12, 3))
    frame = np.kron(base, np.ones((8, 8, 1))).astype(np.float32)

    with native.NativeMtcnn(npz) as det:
        boxes, _ = det.detect(frame, thresholds=(0.45, 0.35, 0.3))
    assert boxes.shape[0] > 0
    x1, y1, x2, y2 = np.clip(
        boxes[0, :4], 0, [frame.shape[1], frame.shape[0]] * 2).astype(int)
    crop = frame[y1:max(y2, y1 + 2), x1:max(x2, x1 + 2)].mean(axis=-1)
    crop64 = _np_bilinear(crop, 64, 64).astype(np.float32) / 255.0

    store_path = str(tmp_path / "ids.fjdb")
    with native.NativeEmbedder(export_dir) as emb:
        fv = emb.extract(crop64)
        with native.NativeIdentityStore(store_path, emb.feature_dim) as st:
            assert st.register("alice", fv) >= 0  # row id; 0 = first row
            name, sim = st.match(fv, sim_th=0.5)
    assert name == "alice"
    assert sim > 0.99


def test_identify_cli_native_mtcnn(mtcnn_setup, tmp_path):
    """identify enroll/match --native-mtcnn: raw frames in, identities out,
    with detection AND embedding in the native runtime (the reference's
    single-process loop driven from the CLI)."""
    native = _native()
    pn, rn, on, npz = mtcnn_setup

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        identify,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
        save_image_store,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_params,
    )

    model = EFMNet342(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32))
    export_dir = str(tmp_path / "export")
    export_params(export_dir, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(64, 64), input_channels=1)

    # two "identities", two identical raw frames each (smooth so the
    # random-weight cascade fires with permissive thresholds)
    rng = np.random.default_rng(11)
    frames, labels = [], []
    for ident in range(2):
        base = rng.uniform(40, 210, (9, 12, 3))
        frame = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
        frames += [frame, frame]
        labels += [ident, ident]
    store = str(tmp_path / "frames.npz")
    save_image_store(store, np.stack(frames), np.asarray(labels))

    db = str(tmp_path / "ids.fjdb")
    common = ["--store", db, "--features", store,
              "--native-export", export_dir, "--native-mtcnn", npz,
              "--mtcnn-thresholds", "0.45", "0.35", "0.3"]
    stored = identify.main(["enroll"] + common)
    assert stored >= 2  # at least one representative per identity

    out = str(tmp_path / "results.jsonl")
    identify.main(["match"] + common + ["--sim-th", "0.5", "--out", out])
    import json

    rows = [json.loads(line) for line in open(out)]
    assert len(rows) >= 2
    for r in rows:
        assert r["name"] == f"id_{r['label']}"
        assert r["similarity"] > 0.99


def test_quantized_cascade_tracks_f32(mtcnn_setup):
    """NativeMtcnn(quantized=True): int8 convs produce the same detections
    on the fixture frames (counts equal, boxes within a pixel). Perf note:
    PNet's tiny output channels (10/16/32) make the pyramid im2col-bound,
    so int8 wins only ~10% on busy frames (measured; unlike the embedder's
    2.9x on its 96-261-channel convs)."""
    native = _native()
    pn, rn, on, npz = mtcnn_setup
    rng = np.random.default_rng(42)
    th = (0.45, 0.35, 0.3)
    with native.NativeMtcnn(npz) as det_f32, \
            native.NativeMtcnn(npz, quantized=True) as det_q:
        assert det_q.quantized
        # net-level int8 error: PNet prob/reg maps track f32 closely
        x = rng.uniform(-1, 1, (40, 50, 3)).astype(np.float32)
        of = det_f32.stage_forward(0, x)
        oq = det_q.stage_forward(0, x)
        assert np.abs(of - oq).max() < 0.05
        # decision level: random weights put a continuum of candidates at
        # the permissive fixture thresholds, so counts drift; require most
        # of either set to have an IoU>0.7 counterpart in the other
        base = rng.uniform(40, 210, (9, 12, 3))
        img = np.kron(base, np.ones((8, 8, 1))).astype(np.float32)
        fb, _ = det_f32.detect(img, thresholds=th)
        qb, _ = det_q.detect(img, thresholds=th)
        assert fb.shape[0] > 0 and qb.shape[0] > 0

        def overlap_frac(src, ref):
            hits = 0
            for i in range(src.shape[0]):
                x1 = np.maximum(src[i, 0], ref[:, 0])
                y1 = np.maximum(src[i, 1], ref[:, 1])
                x2 = np.minimum(src[i, 2], ref[:, 2])
                y2 = np.minimum(src[i, 3], ref[:, 3])
                inter = (np.maximum(0, x2 - x1 + 1)
                         * np.maximum(0, y2 - y1 + 1))
                a_s = ((src[i, 2] - src[i, 0] + 1)
                       * (src[i, 3] - src[i, 1] + 1))
                a_r = ((ref[:, 2] - ref[:, 0] + 1)
                       * (ref[:, 3] - ref[:, 1] + 1))
                if (inter / (a_s + a_r - inter)).max() > 0.7:
                    hits += 1
            return hits / src.shape[0]

        assert overlap_frac(qb, fb) > 0.7, (qb.shape, fb.shape)
        assert overlap_frac(fb, qb) > 0.7


def test_cascade_parity_odd_geometries(mtcnn_setup, monkeypatch):
    """Tall, wide, and odd-dimension frames: the transposition dance and
    pad()/crop arithmetic must hold off the square happy path."""
    native = _native()
    pn, rn, on, npz = mtcnn_setup
    monkeypatch.setattr(pipeline, "imresample", _fake_imresample)
    host = pipeline.MTCNNDetector(pn, rn, on)
    rng = np.random.default_rng(7)
    th = (0.45, 0.35, 0.3)
    with native.NativeMtcnn(npz) as det:
        for hw in [(51, 121), (121, 51), (67, 89)]:
            base = rng.uniform(40, 210,
                               ((hw[0] + 7) // 8, (hw[1] + 7) // 8, 3))
            img = np.kron(base, np.ones((8, 8, 1)))[:hw[0], :hw[1]].astype(
                np.float32)
            hb, hp = host.detect(img, thresholds=th)
            nb, npts = det.detect(img, thresholds=th)
            assert nb.shape[0] == hb.shape[0], hw
            if hb.shape[0]:
                np.testing.assert_allclose(nb[:, :4], hb[:, :4], atol=0.1)
                np.testing.assert_allclose(npts, hp, atol=0.1)


def test_person_flows_native_mtcnn(mtcnn_setup, tmp_path):
    """enroll-person/match-person --native-mtcnn: the person-level DB flows
    (Register_PDB/Compare_Face_DB) fed from raw frames through the native
    detect+embed path."""
    native = _native()
    pn, rn, on, npz = mtcnn_setup

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        identify,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
        save_image_store,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_params,
    )

    model = EFMNet342(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32))
    export_dir = str(tmp_path / "export")
    export_params(export_dir, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(64, 64), input_channels=1)

    rng = np.random.default_rng(11)
    base = rng.uniform(40, 210, (9, 12, 3))
    frame = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    store = str(tmp_path / "frames.npz")
    save_image_store(store, np.stack([frame, frame]), np.asarray([0, 0]))

    db = str(tmp_path / "p.sqlite")
    data_root = str(tmp_path / "face_db")
    common = ["--features", store, "--native-export", export_dir,
              "--native-mtcnn", npz,
              "--mtcnn-thresholds", "0.45", "0.35", "0.3"]
    pid = identify.main(["enroll-person", "--store", db, "--label", "0",
                         "--name", "alice", "--student-id", "901",
                         "--data-root", data_root] + common)
    assert pid is not None
    # the natively detected crops back the Register_PDB profile images
    # (reference stores them under face_db_data_root, Feature.hpp:806-860)
    pngs = [f for root, _, files in os.walk(data_root)
            for f in files if f.endswith(".png")]
    assert pngs, "no profile/face crops written under --data-root"
    results = identify.main(["match-person", "--store", db,
                             "--sim-th", "0.5"] + common)
    assert results and all(r["name"] == "alice" for r in results)


def test_cascade_fuzz_no_crash_and_parity(mtcnn_setup, monkeypatch):
    """Seeded sweep over random sizes/aspect ratios/threshold regimes: the
    native cascade never crashes, and under identical resampling stays
    box-for-box equal to the host path everywhere."""
    native = _native()
    pn, rn, on, npz = mtcnn_setup
    monkeypatch.setattr(pipeline, "imresample", _fake_imresample)
    host = pipeline.MTCNNDetector(pn, rn, on)
    rng = np.random.default_rng(2024)
    with native.NativeMtcnn(npz) as det:
        for trial in range(8):
            h = int(rng.integers(24, 140))
            w = int(rng.integers(24, 140))
            th1 = float(rng.uniform(0.4, 0.8))
            th = (th1, 0.35, 0.3)
            minsize = int(rng.integers(12, 40))
            if rng.random() < 0.5:  # smooth (detections likely)
                cell = int(rng.integers(4, 10))
                img = np.kron(
                    rng.uniform(30, 220, ((h + cell - 1) // cell,
                                          (w + cell - 1) // cell, 3)),
                    np.ones((cell, cell, 1)))[:h, :w].astype(np.float32)
            else:  # noise
                img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
            hb, hp = host.detect(img, minsize=minsize, thresholds=th)
            nb, npts = det.detect(img, minsize=minsize, thresholds=th)
            assert nb.shape[0] == hb.shape[0], (trial, h, w, th1, minsize)
            if hb.shape[0]:
                np.testing.assert_allclose(nb[:, :4], hb[:, :4], atol=0.1,
                                           err_msg=str((trial, h, w)))
                np.testing.assert_allclose(npts, hp, atol=0.1,
                                           err_msg=str((trial, h, w)))


def test_identify_native_all_faces(mtcnn_setup, tmp_path):
    """match --mtcnn-all-faces: every detection in a frame gets its own
    result row with (probe=frame, face=box) indices — the reference's
    per-face Compare_Face_DB loop from the CLI."""
    native = _native()
    pn, rn, on, npz = mtcnn_setup

    import json

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        identify,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
        save_image_store,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_params,
    )

    model = EFMNet342(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32))
    export_dir = str(tmp_path / "export")
    export_params(export_dir, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(64, 64), input_channels=1)

    rng = np.random.default_rng(11)
    base = rng.uniform(40, 210, (9, 12, 3))
    frame = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    store = str(tmp_path / "frames.npz")
    save_image_store(store, np.stack([frame]), np.asarray([0]))

    db = str(tmp_path / "ids.fjdb")
    common = ["--store", db, "--features", store,
              "--native-export", export_dir, "--native-mtcnn", npz,
              "--mtcnn-thresholds", "0.45", "0.35", "0.3"]
    identify.main(["enroll"] + common)  # largest face as id_0

    out = str(tmp_path / "all.jsonl")
    identify.main(["match"] + common + ["--mtcnn-all-faces",
                                        "--sim-th", "-1.0", "--out", out])
    rows = [json.loads(line) for line in open(out)]
    assert len(rows) >= 2, "fixture frame should carry multiple detections"
    assert all(r["probe"] == 0 for r in rows)
    faces = sorted(r["face"] for r in rows)
    assert faces == list(range(len(rows)))  # one row per box, in order
