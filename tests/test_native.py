"""Native serving layer via ctypes: matcher/store/queue/NMS/state machine
(reference C18-C23), cross-validated against the Python oracles."""

import subprocess

import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.ops import (
    boxes as B,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
    native as N,
)


@pytest.fixture(scope="module", autouse=True)
def built():
    try:
        N.build_native()
    except N.NativeUnavailable as e:
        pytest.skip(f"native toolchain unavailable: {e}")


def test_native_cosine_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=342).astype(np.float32)
    b = rng.normal(size=342).astype(np.float32)
    got = N.native_cosine(a, b)
    ref = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(got - ref) < 1e-5


def test_native_gallery_match():
    rng = np.random.default_rng(1)
    gallery = rng.normal(size=(200, 342)).astype(np.float32)
    q = gallery[123] * 3.0
    idx, sim = N.native_match_gallery(gallery, q, sim_th=0.9)
    assert idx == 123
    assert abs(sim - 1.0) < 1e-5
    # below threshold -> -1 with best sim still reported
    idx, sim = N.native_match_gallery(gallery, rng.normal(size=342), 0.999)
    assert idx == -1 and sim < 0.999


def test_native_nms_matches_python_oracle():
    rng = np.random.default_rng(2)
    x1 = rng.uniform(0, 100, 50)
    y1 = rng.uniform(0, 100, 50)
    boxes = np.stack([x1, y1, x1 + rng.uniform(5, 40, 50),
                      y1 + rng.uniform(5, 40, 50),
                      rng.uniform(0, 1, 50)], 1).astype(np.float32)
    for method in ("Union", "Min"):
        ref = B.nms(boxes.astype(np.float64), 0.4, method)
        got = N.native_nms(boxes, 0.4, method)
        np.testing.assert_array_equal(ref, got)


def test_native_identity_store(tmp_path):
    path = str(tmp_path / "ids.fjdb")
    dim = 16
    rng = np.random.default_rng(3)
    a = rng.normal(size=dim).astype(np.float32)
    b = rng.normal(size=dim).astype(np.float32)
    with N.NativeIdentityStore(path, dim) as store:
        assert len(store) == 0
        assert store.register("alice", a) == 0
        assert store.register("bob", b) == 1
        assert store.register("dup_alice", a * 2.0) == -1  # deduped
        name, sim = store.match(a, sim_th=0.5)
        assert name == "alice" and sim > 0.99
        name, sim = store.match(rng.normal(size=dim), sim_th=0.9999)
        assert name is None
    # persistence across open/close
    with N.NativeIdentityStore(path, dim) as store:
        assert len(store) == 2
        name, _ = store.match(b, sim_th=0.5)
        assert name == "bob"


def test_native_queue_drop_stale():
    q = N.NativeFrameQueue()
    try:
        assert q.consume(4) is None
        for i in range(5):
            q.produce(np.full(4, float(i), np.float32), seq=i)
        frame, seq = q.consume(4, remove_old=True)
        assert seq == 4
        np.testing.assert_allclose(frame, 4.0)
        assert q.consume(4) is None
        # FIFO mode
        q.produce(np.zeros(4, np.float32), seq=10)
        q.produce(np.ones(4, np.float32), seq=11)
        _, seq = q.consume(4)
        assert seq == 10
    finally:
        q.close()


def test_native_state_machine():
    sm = N.NativeStateMachine()
    try:
        assert sm.state == "Identification"
        assert not sm.handle("name_entered")  # invalid transition
        for ev in ("start_registration", "name_entered", "countdown_done",
                   "images_acquired", "images_selected", "details_entered",
                   "feature_stored", "tick"):
            assert sm.handle(ev), ev
        assert sm.state == "Identification"
        sm.handle("start_registration")
        assert sm.handle("cancel")
        assert sm.state == "Identification"
    finally:
        sm.close()


def test_native_clustering_selects_diverse():
    f = np.asarray([
        [1, 0, 0, 0],
        [0.999, 0.01, 0, 0],
        [0, 1, 0, 0],
        [0, 0, 1, 0],
    ], np.float32)
    sel = N.native_select_representatives(f, 0.95)
    np.testing.assert_array_equal(sel, [0, 2, 3])


def test_cpp_test_binary_passes():
    """The standalone assert-based native test binary also passes."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.native import (
        simd_build_flags,
    )

    binary = os.path.join(repo, "cpp", "build", "test_native")
    if not os.path.exists(binary):
        r = subprocess.run(
            ["g++", "-O2", "-std=c++17", *simd_build_flags(), "-fopenmp",
             "-I", os.path.join(repo, "cpp", "include"),
             os.path.join(repo, "cpp", "src", "test_native.cpp"),
             "-o", binary, "-lpthread"], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build native tests: {r.stderr[:200]}")
    out = subprocess.run([binary], capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "ALL NATIVE TESTS PASSED" in out.stdout


def test_recognition_service_end_to_end(tmp_path):
    """Full serving loop: enroll two identities, then identify frames pushed
    through the drop-stale queue (SURVEY.md §3.4 flow)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.recognition import (
        RecognitionService,
    )

    rng = np.random.default_rng(7)
    shape = (16, 16, 1)
    dim = 32
    proj = rng.normal(size=(int(np.prod(shape)), dim)).astype(np.float32)

    def embed_fn(frames):
        flat = np.asarray(frames, np.float32).reshape(len(frames), -1)
        e = flat @ proj
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    base_a = rng.normal(size=shape).astype(np.float32)
    base_b = rng.normal(size=shape).astype(np.float32)
    with RecognitionService(embed_fn, str(tmp_path / "db.fjdb"), dim,
                            sim_threshold=0.8, frame_shape=shape) as svc:
        assert svc.identify_latest() is None  # empty queue
        na = svc.register("alice", np.stack(
            [base_a + 0.01 * rng.normal(size=shape) for _ in range(4)]))
        nb = svc.register("bob", np.stack(
            [base_b + 0.01 * rng.normal(size=shape) for _ in range(4)]))
        assert na >= 1 and nb >= 1
        assert svc.sm.state == "Identification"
        # stale frames of bob then the freshest of alice: drop-stale wins
        for i in range(3):
            svc.push_frame(base_b, seq=i)
        svc.push_frame(base_a, seq=99)
        name, sim, seq = svc.identify_latest()
        assert name == "alice" and seq == 99 and sim > 0.9


def test_tpu_gallery_matcher_matches_native():
    """Device-side bulk matcher agrees with the AVX scan row-by-row."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.gallery import (
        match_gallery_tpu,
    )

    rng = np.random.default_rng(11)
    gallery = rng.normal(size=(300, 64)).astype(np.float32)
    queries = np.concatenate([
        gallery[[5, 250]] * 2.0,                        # exact directions
        rng.normal(size=(6, 64)).astype(np.float32),    # random
    ])
    idx, sim = match_gallery_tpu(gallery, queries, sim_th=-1.0)
    for q, (i_tpu, s_tpu) in zip(queries, zip(idx, sim)):
        i_ref, s_ref = N.native_match_gallery(gallery, q, sim_th=-1.0)
        assert i_tpu == i_ref
        assert abs(s_tpu - s_ref) < 1e-4
    assert idx[0] == 5 and idx[1] == 250

    # narrow storage dtypes: the exact-direction winners hold, sims stay
    # within the narrowing error (bf16 half / int8 quarter bytes)
    import jax.numpy as jnp

    for ndtype, tol in ((jnp.bfloat16, 5e-3), (jnp.int8, 2e-2)):
        idx_n, sim_n = match_gallery_tpu(gallery, queries, sim_th=-1.0,
                                         dtype=ndtype)
        assert idx_n[0] == 5 and idx_n[1] == 250
        np.testing.assert_allclose(sim_n, sim, atol=tol)


def test_tpu_gallery_matcher_threshold():
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.gallery import (
        match_gallery_tpu,
    )

    gallery = np.eye(4, dtype=np.float32)
    q = np.asarray([[0.0, 1.0, 0.0, 0.0], [0.5, 0.5, 0.5, 0.5]], np.float32)
    idx, sim = match_gallery_tpu(gallery, q, sim_th=0.9)
    assert idx[0] == 1 and sim[0] > 0.99
    assert idx[1] == -1  # 0.5 cosine, below threshold


def test_sharded_gallery_matcher_equals_single_device():
    """Gallery rows sharded over the 8-device mesh: global winners must be
    identical to the single-device matmul matcher, including a gallery size
    that does NOT divide the device count (padding rows must never win)
    and NaN gallery rows (Compare_Face_From_DB's guard)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.gallery import (
        match_gallery_sharded,
        match_gallery_tpu,
    )

    rng = np.random.default_rng(12)
    gallery = rng.normal(size=(301, 48)).astype(np.float32)  # 301 % 8 != 0
    gallery[17] = np.nan
    queries = np.concatenate([
        gallery[[0, 300, 37]] * 3.0,
        rng.normal(size=(5, 48)).astype(np.float32),
    ])
    i_ref, s_ref = match_gallery_tpu(gallery, queries, sim_th=-1.0)
    idx, sim = match_gallery_sharded(gallery, queries, sim_th=-1.0)
    np.testing.assert_array_equal(idx, i_ref)
    np.testing.assert_allclose(sim, s_ref, atol=1e-5)
    assert idx[0] == 0 and idx[1] == 300  # incl. the last (padded) shard


@pytest.mark.parametrize("sanitizer,flags", [
    ("tsan", "-fsanitize=thread"),
    ("asan", "-fsanitize=address,undefined"),
])
def test_native_under_sanitizers(sanitizer, flags):
    """Race/memory detection for the concurrent native layer (SURVEY.md §5.2
    rebuild: the reference had only by-construction correctness)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.native import (
        simd_build_flags,
    )

    binary = os.path.join(repo, "cpp", "build", f"test_native_{sanitizer}")
    if not os.path.exists(binary):
        # sanitize the PRODUCTION SIMD paths (AVX2/AVX-512 lane handling
        # is exactly where out-of-bounds bugs would live), not just the
        # scalar fallback
        r = subprocess.run(
            ["g++", "-O1", "-g", "-std=c++17", *flags.split(),
             *simd_build_flags(), "-fopenmp",
             "-I", os.path.join(repo, "cpp", "include"),
             os.path.join(repo, "cpp", "src", "test_native.cpp"),
             "-o", binary, "-lpthread"], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"sanitizer build unavailable: {r.stderr[:200]}")
    env = {**os.environ, "TSAN_OPTIONS": "halt_on_error=1"}
    out = subprocess.run([binary], capture_output=True, text=True,
                         timeout=300, env=env)
    assert out.returncode == 0, out.stderr[-500:]
    assert "ALL NATIVE TESTS PASSED" in out.stdout


def test_identity_store_person_metadata(tmp_path):
    """C20 person-record capability: JSON metadata persists per row."""
    import os

    # force a rebuild of the shared lib if the source is newer
    N.build_native()
    path = str(tmp_path / "pdb.fjdb")
    rng = np.random.default_rng(4)
    fv = rng.normal(size=8).astype(np.float32)
    record = {"title": "student", "email": "a@b.c", "student_id": "s123",
              "card_id": "0xCAFE"}
    with N.NativeIdentityStore(path, 8) as store:
        idx = store.register("alice", fv, meta=record)
        assert idx == 0
        assert store.meta(0) == record
        assert store.register("plain", rng.normal(size=8).astype(np.float32)) == 1
        assert store.meta(1) == {}
        assert store.meta(5) is None
    with N.NativeIdentityStore(path, 8) as store:  # persists across reopen
        assert store.meta(0)["student_id"] == "s123"


def test_identify_cli_enroll_and_match(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        identify,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
        save_feature_store,
        synthetic_features,
    )

    gallery_f, gallery_l = synthetic_features(num_ids=5, per_id=6, dim=32,
                                              seed=0, noise=0.05)
    save_feature_store(str(tmp_path / "gal.npz"), gallery_f, gallery_l)
    # probes: same identities, new noise
    probe_f, probe_l = synthetic_features(num_ids=5, per_id=2, dim=32,
                                          seed=0, noise=0.05)
    save_feature_store(str(tmp_path / "probe.npz"), probe_f, probe_l)
    (tmp_path / "classes.json").write_text(
        '{"classes": ["a", "b", "c", "d", "e"]}')

    store = str(tmp_path / "db.fjdb")
    stored = identify.main(["enroll", "--store", store, "--features",
                            str(tmp_path / "gal.npz"),
                            "--names-json", str(tmp_path / "classes.json")])
    assert stored >= 5
    results = identify.main(["match", "--store", store, "--features",
                             str(tmp_path / "probe.npz"), "--sim-th", "0.8",
                             "--out", str(tmp_path / "res.jsonl")])
    names = "abcde"
    correct = sum(1 for r in results
                  if r["name"] == names[r["label"]])
    assert correct == len(results)  # clean synthetic clusters: all correct
    assert len(open(tmp_path / "res.jsonl").readlines()) == len(results)


def test_identify_cli_match_empty_store(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        identify,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
        save_feature_store,
        synthetic_features,
    )

    f, l = synthetic_features(num_ids=2, per_id=2, dim=8)
    save_feature_store(str(tmp_path / "p.npz"), f, l)
    with pytest.raises(SystemExit):
        identify.main(["match", "--store", str(tmp_path / "none.fjdb"),
                       "--features", str(tmp_path / "p.npz")])


def test_store_exists_and_skip_existing_names(tmp_path):
    """Register_and_Check semantics: name lookup + enroll --skip-existing-
    names skips re-registration of enrolled identities."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        identify,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
        save_feature_store,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (
        synthetic_features,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )

    try:
        native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native unavailable: {e}")

    feats, labels = synthetic_features(num_ids=3, per_id=3, dim=16, seed=2)
    fpath = str(tmp_path / "f.npz")
    save_feature_store(fpath, feats, labels)
    db = str(tmp_path / "db.fjdb")
    identify.main(["enroll", "--store", db, "--features", fpath])
    with native.NativeIdentityStore(db, 16) as st:
        n0 = len(st)
        assert st.exists("id_0") and not st.exists("nobody")
    # different feature noise, same names: all three identities skip
    feats2, labels2 = synthetic_features(num_ids=3, per_id=3, dim=16, seed=9)
    fpath2 = str(tmp_path / "f2.npz")
    save_feature_store(fpath2, feats2, labels2)
    identify.main(["enroll", "--store", db, "--features", fpath2,
                   "--skip-existing-names"])
    with native.NativeIdentityStore(db, 16) as st:
        assert len(st) == n0  # nothing added


def test_identify_cli_native_embed_flow(tmp_path):
    """pixels -> identity in one native process: `identify enroll/match
    --native-export` embeds IMAGE stores with the C++ forward (f32 enroll,
    int8 probe — the mixed-precision deployment case)."""
    jax = pytest.importorskip("jax")
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

    model = EFMNet342(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32))
    export = str(tmp_path / "export")
    export_params(export, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(32, 32), input_channels=1)

    rng = np.random.default_rng(5)
    base = rng.random((3, 32, 32, 1)).astype(np.float32)  # 3 identities
    gal = np.clip(base[:, None] + 0.01 * rng.standard_normal(
        (3, 2, 32, 32, 1)), 0, 1).reshape(6, 32, 32, 1).astype(np.float32)
    gal_labels = np.repeat(np.arange(3), 2)
    probe = np.clip(base + 0.01 * rng.standard_normal(base.shape), 0,
                    1).astype(np.float32)
    save_image_store(str(tmp_path / "gal.npz"), gal, gal_labels)
    save_image_store(str(tmp_path / "probe.npz"), probe, np.arange(3))

    store = str(tmp_path / "db.fjdb")
    stored = identify.main(["enroll", "--store", store,
                            "--features", str(tmp_path / "gal.npz"),
                            "--native-export", export])
    assert stored >= 3
    results = identify.main(["match", "--store", store,
                             "--features", str(tmp_path / "probe.npz"),
                             "--native-export", export, "--int8",
                             "--sim-th", "0.8"])
    assert all(r["name"] == f"id_{r['label']}" for r in results)
