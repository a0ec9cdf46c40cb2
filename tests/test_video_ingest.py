"""Live video ingest (VERDICT round-1 item 9): cv2 VideoCapture producer ->
native drop-stale queue -> registration + recognition, on a recorded-file
fixture (reference StreamLoop, CameraSettings.h:21)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (  # noqa: E402
    synthetic_faces,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.video import (  # noqa: E402
    VideoProducer,
    write_test_video,
)


def _identity_video(tmp_path, n_frames=60, size=32, seed=0):
    """A video of ONE synthetic identity (small per-frame noise)."""
    imgs, labels = synthetic_faces(num_ids=1, per_id=n_frames, size=size,
                                   seed=seed)
    path = str(tmp_path / "cam.avi")
    n = write_test_video(path, imgs[..., 0], fps=10)
    assert n == n_frames
    return path, imgs


def test_write_and_capture_roundtrip(tmp_path):
    path, imgs = _identity_video(tmp_path, n_frames=8)
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape[:2] == imgs.shape[1:3]
        n += 1
    cap.release()
    assert n == 8


def test_video_producer_feeds_queue(tmp_path):
    """Producer thread pushes normalized frames; the drop-stale queue hands
    back the freshest one."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )

    try:
        native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native unavailable: {e}")

    path, _ = _identity_video(tmp_path, n_frames=12, size=32)

    class _Svc:
        frame_shape = (16, 16, 1)

        def __init__(self):
            self.queue = native.NativeFrameQueue()
            self.pushed = []

        def push_frame(self, frame, seq=0):
            assert frame.shape == self.frame_shape
            assert frame.dtype == np.float32
            assert 0.0 <= frame.min() and frame.max() <= 1.0
            self.pushed.append(seq)
            self.queue.produce(frame.ravel(), seq)

    svc = _Svc()
    with VideoProducer(path, svc, fps_cap=500.0) as p:
        p.finished.wait(20)
    assert p.frames_pushed == 12
    assert svc.pushed == list(range(12))
    got = svc.queue.consume(16 * 16, remove_old=True)
    assert got is not None
    _, seq = got
    assert seq == 11  # drop-stale: freshest frame wins
    svc.queue.close()


def test_serve_demo_video_registers_and_identifies(tmp_path):
    """`serve_demo --video <file>` enrolls from the first frames and
    identifies the rest of the stream (item 9 'done' criterion)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        serve_demo,
    )

    path, _ = _identity_video(tmp_path, n_frames=80, size=32, seed=3)
    store = str(tmp_path / "demo.fjdb")
    results = serve_demo.main([
        "--video", path, "--model", "lightcnn9", "--image-size", "32",
        "--store", store, "--register-name", "alice",
        "--register-frames", "3", "--sim-threshold", "0.3",
        "--fps-cap", "25"])
    assert results, "no frames identified after registration"
    matched = [n for _, n, _ in results]
    # same-identity frames with a random-init embedding of the SAME pattern
    # still land closest to the enrolled features
    assert matched.count("alice") >= len(matched) * 0.6


def test_serve_demo_video_detect_fused_pipeline(tmp_path):
    """`serve_demo --video <file> --detect`: full-scene frames through the
    fused detect->crop->embed->match pipeline (serve/pipeline.py), with
    registration crops from the host cascade — the reference's complete
    per-frame loop driven end-to-end from the CLI."""
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        serve_demo,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.video import (
        write_test_video,
    )

    # a repeated smooth scene: random-weight MTCNN fires on it at the
    # permissive thresholds (same fixture family as test_native_mtcnn)
    rng = np.random.default_rng(42)
    base = rng.uniform(40, 210, (9, 12, 3))
    scene = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)  # 72x96x3
    frames = np.stack([scene] * 40)
    path = str(tmp_path / "scene.avi")
    write_test_video(path, frames)

    results = serve_demo.main([
        "--video", path, "--detect", "--frame-size", "72", "96",
        "--model", "efmnet342", "--image-size", "32",
        "--det-thresholds", "0.45", "0.35", "0.3",
        "--store", str(tmp_path / "d.fjdb"), "--register-name", "alice",
        "--register-frames", "2", "--sim-threshold", "0.3",
        "--fps-cap", "25"])
    assert results, "no frames went through the fused pipeline"
    matched = [n for _, n, _ in results]
    # identical scenes: whatever the random cascade crops, the fused
    # pipeline must match the enrolled identity on most frames
    assert matched.count("alice") >= len(matched) * 0.6


def test_serve_demo_video_detect_dynamic_gallery(tmp_path):
    """`--detect --dynamic-gallery`: the fused pipeline compiles at startup
    with the gallery as a runtime argument; enrollments grow the row count
    with zero retrace, and identification matches the baked-gallery flow."""
    import numpy as np
    import pytest

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        serve_demo,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.video import (
        write_test_video,
    )

    rng = np.random.default_rng(42)
    base = rng.uniform(40, 210, (9, 12, 3))
    scene = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    path = str(tmp_path / "scene.avi")
    write_test_video(path, np.stack([scene] * 40))

    results = serve_demo.main([
        "--video", path, "--detect", "--dynamic-gallery",
        "--frame-size", "72", "96",
        "--model", "efmnet342", "--image-size", "32",
        "--det-thresholds", "0.45", "0.35", "0.3",
        "--store", str(tmp_path / "dg.fjdb"), "--register-name", "alice",
        "--register-frames", "2", "--sim-threshold", "0.3",
        "--fps-cap", "25"])
    assert results, "no frames went through the fused pipeline"
    matched = [n for _, n, _ in results]
    assert matched.count("alice") >= len(matched) * 0.6

    # the flag is pipeline-only: loud error outside --video --detect /
    # --streams (the state-machine and native paths have no runtime-arg
    # gallery)
    with pytest.raises(SystemExit):
        serve_demo.main(["--dynamic-gallery", "--image-size", "32"])
    with pytest.raises(SystemExit):
        serve_demo.main(["--video", path, "--detect", "--native",
                         "--dynamic-gallery", "--image-size", "32"])


def test_serve_demo_person_db_multi_person(tmp_path):
    """--person-db: stream enrollments write through to the durable
    PersonStore, and a later identify-only run (--register-frames 0) cold
    starts the HBM gallery from the DB and resolves the RIGHT person's
    name among several enrolled people."""
    import numpy as np
    import pytest

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        serve_demo,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.video import (
        write_test_video,
    )

    rng = np.random.default_rng(77)
    scenes = {}
    for name, seed in (("alice", 1), ("bob", 2)):
        r = np.random.default_rng(seed)
        base = r.uniform(40, 210, (9, 12, 3))
        scene = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
        path = str(tmp_path / f"{name}.avi")
        write_test_video(path, np.stack([scene] * 25))
        scenes[name] = path
    db = str(tmp_path / "people.sqlite")
    common = ["--detect", "--dynamic-gallery", "--person-db", db,
              "--frame-size", "72", "96", "--model", "efmnet342",
              "--image-size", "32", "--det-thresholds", "0.45", "0.35",
              "0.3", "--sim-threshold", "0.3", "--fps-cap", "25"]

    # enroll both people from their own streams (write-through)
    for name in ("alice", "bob"):
        res = serve_demo.main(
            ["--video", scenes[name], "--register-name", name,
             "--register-frames", "2",
             "--store", str(tmp_path / f"{name}.fjdb")] + common)
        assert res, f"{name}: no frames went through the pipeline"

    # identify-only cold start: alice's stream must resolve to 'alice'
    # (her enrolled rows cosine ~1 to her own frames; argmax beats bob)
    res = serve_demo.main(
        ["--video", scenes["alice"], "--register-frames", "0",
         "--register-name", "alice",
         "--store", str(tmp_path / "probe.fjdb")] + common)
    assert res
    names = [n for _, n, _ in res if n is not None]
    assert names and all(n == "alice" for n in names)

    # flag validation
    with pytest.raises(SystemExit):
        serve_demo.main(["--person-db", db, "--image-size", "32"])
    with pytest.raises(SystemExit):
        serve_demo.main(["--video", scenes["alice"], "--detect",
                         "--register-frames", "0", "--image-size", "32"])


def test_serve_demo_video_detect_multiface(tmp_path):
    """`--detect --max-faces K`: per-frame multi-face identification through
    make_multiface_pipeline from the CLI."""
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        serve_demo,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.video import (
        write_test_video,
    )

    rng = np.random.default_rng(42)
    base = rng.uniform(40, 210, (9, 12, 3))
    scene = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    path = str(tmp_path / "scene.avi")
    write_test_video(path, np.stack([scene] * 30))

    results = serve_demo.main([
        "--video", path, "--detect", "--frame-size", "72", "96",
        "--max-faces", "4", "--model", "efmnet342", "--image-size", "32",
        "--det-thresholds", "0.45", "0.35", "0.3",
        "--store", str(tmp_path / "m.fjdb"), "--register-name", "alice",
        "--register-frames", "2", "--sim-threshold", "0.3",
        "--fps-cap", "25"])
    assert results
    matched = [n for _, n, _ in results]
    assert matched.count("alice") >= len(matched) * 0.6


def test_serve_demo_video_fully_native_loop(tmp_path):
    """`--video --detect --native --native-mtcnn`: the reference app's exact
    process shape — camera -> queue -> C++ detect -> crop -> C++ embed ->
    C++ match/register, zero JAX in the loop."""
    import jax
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        serve_demo,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
        mtcnn as mtcnn_nets,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_mtcnn,
        export_params,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.video import (
        write_test_video,
    )

    try:
        native.load_native()
    except native.NativeUnavailable as e:
        import pytest

        pytest.skip(f"native unavailable: {e}")

    model = EFMNet342(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32))
    export_dir = str(tmp_path / "export")
    export_params(export_dir, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(32, 32), input_channels=1)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    mtcnn_npz = str(tmp_path / "mtcnn.npz")
    export_mtcnn(mtcnn_npz, mtcnn_nets.init_pnet_params(k1),
                 mtcnn_nets.init_rnet_params(k2),
                 mtcnn_nets.init_onet_params(k3))

    rng = np.random.default_rng(42)
    base = rng.uniform(40, 210, (9, 12, 3))
    scene = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    path = str(tmp_path / "scene.avi")
    write_test_video(path, np.stack([scene] * 30))

    results = serve_demo.main([
        "--video", path, "--detect", "--native",
        "--native-mtcnn", mtcnn_npz, "--export-dir", export_dir,
        "--frame-size", "72", "96", "--image-size", "32",
        "--det-thresholds", "0.45", "0.35", "0.3",
        "--store", str(tmp_path / "n.fjdb"), "--register-name", "alice",
        "--register-frames", "2", "--sim-threshold", "0.3",
        "--fps-cap", "25"])
    assert results
    matched = [n for _, n, _ in results]
    assert matched.count("alice") >= len(matched) * 0.6
