"""Standalone native demo binary (cpp/src/demo_main.cpp) — VERDICT r2
item 5: the reference's C++ app process (tmp.cpp:24-28, StreamLoop
CameraSettings.h:21) with ZERO Python in the process: MJPG video ->
producer thread -> SpscQueue (drop-stale) -> NativeMtcnn -> NativeErt ->
NativeNet -> IdentityStore -> registration state machine.

The test synthesizes the full fixture set (random-init MTCNN export, a
random-init EFMNet342 export, a small trained ERT, an MJPG scene video),
builds the binary, runs it end-to-end, and asserts it enrolls and then
identifies the enrolled name on the identification frames.
"""

import os
import re
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP = os.path.join(REPO, "cpp")
SRC = os.path.join(CPP, "src", "demo_main.cpp")


def _build_demo(tmpdir: str) -> str:
    """Prefer the cmake-built binary when fresh; otherwise g++ directly."""
    prebuilt = os.path.join(CPP, "build", "facejax_demo")
    hdrs = [os.path.join(CPP, "include", "facejax", h)
            for h in os.listdir(os.path.join(CPP, "include", "facejax"))]
    newest = max(os.path.getmtime(p) for p in hdrs + [SRC])
    if os.path.exists(prebuilt) and os.path.getmtime(prebuilt) > newest:
        return prebuilt
    if not os.path.exists("/usr/include/opencv4/opencv2/videoio.hpp"):
        pytest.skip("OpenCV dev headers unavailable")
    out = os.path.join(tmpdir, "facejax_demo")
    cmd = ["g++", "-O2", "-std=c++17", "-Wall",
           "-I", os.path.join(CPP, "include"), "-I/usr/include/opencv4",
           SRC, "-o", out, "-lopencv_core", "-lopencv_videoio",
           "-lopencv_imgproc", "-lpthread"]
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.native import (
        simd_build_flags,
    )

    cmd[1:1] = simd_build_flags()
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.fail(f"demo build failed:\n{r.stderr[-4000:]}")
    return out


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.ert import (
        train_shape_predictor,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
        mtcnn as mtcnn_nets,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_ert,
        export_mtcnn,
        export_params,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.video import (
        write_test_video,
    )

    d = tmp_path_factory.mktemp("native_demo")

    model = EFMNet342(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32))
    export_dir = str(d / "export")
    export_params(export_dir, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(32, 32), input_channels=1)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    mtcnn_npz = str(d / "mtcnn.npz")
    export_mtcnn(mtcnn_npz, mtcnn_nets.init_pnet_params(k1),
                 mtcnn_nets.init_rnet_params(k2),
                 mtcnn_nets.init_onet_params(k3))

    # tiny trained ERT so the 68-pt refine stage runs for real
    rng = np.random.default_rng(0)
    size = 64
    images, rects, shapes = [], [], []
    canon = np.stack([rng.uniform(0.2, 0.8, 68), rng.uniform(0.2, 0.8, 68)],
                     axis=1).astype(np.float32)
    for _ in range(12):
        scale = rng.uniform(0.6, 0.8) * (size - 8)
        tx, ty = rng.uniform(2, size - scale - 2, 2)
        s = canon * scale + [tx, ty]
        img = rng.uniform(0, 255, (size, size)).astype(np.float32)
        images.append(img)
        rects.append([tx, ty, tx + scale, ty + scale])
        shapes.append(s)
    pred = train_shape_predictor(
        images, np.asarray(rects, np.float32),
        np.asarray(shapes, np.float32), cascades=2, trees_per_cascade=10,
        tree_depth=2, feature_pool=40, n_split_candidates=8, nu=0.3,
        oversampling=1, seed=0)
    ert_npz = str(d / "ert.npz")
    export_ert(ert_npz, pred)

    # structured static scene (the serve_demo fixture recipe): random-init
    # MTCNN at permissive thresholds finds stable boxes on it
    rng2 = np.random.default_rng(42)
    base = rng2.uniform(40, 210, (9, 12, 3))
    scene = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    video = str(d / "scene.avi")
    write_test_video(video, np.stack([scene] * 30))

    return {"export": os.path.join(export_dir, "weights.npz"),
            "mtcnn": mtcnn_npz, "ert": ert_npz, "video": video,
            "dir": str(d)}


def _run(binary, fixtures, *extra):
    store = os.path.join(fixtures["dir"], "demo.fjdb")
    if os.path.exists(store):
        os.remove(store)
    cmd = [binary, "--video", fixtures["video"],
           "--mtcnn", fixtures["mtcnn"], "--weights", fixtures["export"],
           "--model", "efmnet342", "--store", store,
           "--register-name", "alice", "--register-frames", "2",
           "--image-size", "32", "--th", "0.45", "0.35", "0.3",
           "--sim-th", "0.3", *extra]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=300)


def test_demo_end_to_end(fixtures, tmp_path):
    binary = _build_demo(str(tmp_path))
    r = _run(binary, fixtures, "--ert", fixtures["ert"])
    assert r.returncode == 0, f"demo failed rc={r.returncode}:\n" \
                              f"{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
    m = re.search(r"enrolled 'alice': acquired=(\d+) selected=(\d+) "
                  r"stored=(\d+) dim=342", r.stdout)
    assert m, r.stdout[-2000:]
    assert int(m.group(1)) >= 1
    s = re.search(r"summary frames_read=(\d+) processed=(\d+) faces=(\d+) "
                  r"identified=(\d+) top=(\S+)", r.stdout)
    assert s, r.stdout[-2000:]
    assert int(s.group(4)) >= 1, "no identifications"
    assert s.group(5) == "alice"
    # static scene + trained ERT in the chain -> landmark tag on id lines
    assert "landmarks=68" in r.stdout


def test_demo_int8_path(fixtures, tmp_path):
    """--int8 routes the deep convs of BOTH native nets through qgemm."""
    binary = _build_demo(str(tmp_path))
    r = _run(binary, fixtures, "--int8")
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    assert re.search(r"summary .*identified=[1-9]", r.stdout), \
        r.stdout[-2000:]


def test_demo_missing_args_usage(fixtures, tmp_path):
    binary = _build_demo(str(tmp_path))
    r = subprocess.run([binary, "--video", fixtures["video"]],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 1
    assert "usage:" in r.stderr


def test_demo_store_persists_across_runs(fixtures, tmp_path):
    """Without --reset-store an existing identity DB is PRESERVED (the
    binary must never silently destroy a store); --reset-store wipes it."""
    binary = _build_demo(str(tmp_path))
    store = os.path.join(fixtures["dir"], "demo.fjdb")
    r1 = _run(binary, fixtures)  # _run starts from a fresh store
    assert r1.returncode == 0, r1.stdout[-2000:]
    n1 = int(re.search(r"store_size=(\d+)", r1.stdout).group(1))
    # second run, same store, new name: previous identities must survive
    cmd = [binary, "--video", fixtures["video"], "--mtcnn",
           fixtures["mtcnn"], "--weights", fixtures["export"],
           "--model", "efmnet342", "--store", store,
           "--register-name", "bob", "--register-frames", "2",
           "--image-size", "32", "--th", "0.45", "0.35", "0.3",
           "--sim-th", "0.3"]
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, f"{r2.stdout[-2000:]}\n{r2.stderr[-2000:]}"
    n2 = int(re.search(r"store_size=(\d+)", r2.stdout).group(1))
    assert n2 >= n1  # alice's rows still there (bob's may dedup to 0 new)
    # --reset-store starts over
    r3 = subprocess.run(cmd + ["--reset-store"], capture_output=True,
                        text=True, timeout=300)
    assert r3.returncode == 0, f"{r3.stdout[-2000:]}\n{r3.stderr[-2000:]}"
    n3 = int(re.search(r"store_size=(\d+)", r3.stdout).group(1))
    assert n3 <= n1


def test_demo_person_db_mode(fixtures, tmp_path):
    """--person-db drives the PERSON-LEVEL native store (C20,
    Feature.hpp:679-932) instead of the flat reg_face one: enrollment
    creates one person owning N face rows, identification resolves to
    the person, and the written FJPD file is readable by the Python
    PersonStore (the interchange contract) with alice's own stored
    features matching back to alice."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.person_store import (
        PersonStore,
    )

    binary = _build_demo(str(tmp_path))
    pdb = os.path.join(fixtures["dir"], "demo.fjpd")
    if os.path.exists(pdb):
        os.remove(pdb)
    base = [binary, "--video", fixtures["video"], "--mtcnn",
            fixtures["mtcnn"], "--weights", fixtures["export"],
            "--model", "efmnet342", "--person-db", pdb,
            "--register-frames", "2", "--image-size", "32",
            "--th", "0.45", "0.35", "0.3", "--sim-th", "0.3"]
    r = subprocess.run(base + ["--register-name", "alice"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    s = re.search(r"summary .*identified=(\d+) top=(\S+) top_n=\d+ "
                  r"persons=(\d+) person_faces=(\d+) pid=(\d+)", r.stdout)
    assert s, r.stdout[-2000:]
    assert int(s.group(1)) >= 1 and s.group(2) == "alice"
    assert int(s.group(3)) == 1 and int(s.group(4)) >= 1
    alice_pid = int(s.group(5))

    # second enrollment into the SAME person db from the SAME video:
    # every one of bob's views dedup-rejects against alice's identical
    # faces, stored stays 0, and the pre-created person row is removed
    # again — a zero-face enrollment must NOT leave a dangling identity
    # that can never match (round-4 review finding)
    r2 = subprocess.run(base + ["--register-name", "bob"],
                        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, f"{r2.stdout[-2000:]}\n{r2.stderr[-2000:]}"
    assert "removed empty pid" in r2.stdout, r2.stdout[-2000:]
    s2 = re.search(r"persons=(\d+) person_faces=(\d+)", r2.stdout)
    assert s2 and int(s2.group(1)) == 1

    # a genuinely NEW person (dedup off) still becomes person 2
    r2b = subprocess.run(base + ["--register-name", "bob",
                                 "--dedup-th", "-1"],
                         capture_output=True, text=True, timeout=300)
    assert r2b.returncode == 0, f"{r2b.stdout[-2000:]}\n{r2b.stderr[-2000:]}"
    s2 = re.search(r"persons=(\d+) person_faces=(\d+)", r2b.stdout)
    assert s2 and int(s2.group(1)) == 2

    # interchange: the Python store loads the native file 1:1
    store = PersonStore(os.path.join(fixtures["dir"], "roundtrip.sqlite"),
                        feature_dim=342)
    try:
        n_p, n_f = store.import_fjpd(pdb)
        assert n_f == int(s2.group(2))
        alice = store.get_person(alice_pid)
        assert alice is not None and alice.name == "alice"
        feats = store.faces_of(alice_pid)
        assert feats.shape[0] >= 1 and feats.shape[1] == 342
        m = store.match(feats[0], sim_th=0.5)
        assert m.person is not None and m.person.pid == alice_pid
    finally:
        store.close()


def test_demo_person_db_reads_python_export(fixtures, tmp_path):
    """The reverse interchange direction: a Python-side PersonStore
    export (with an existing person AND a pending card-only
    registration) is a valid native store — the binary keeps carol's
    identity and her pending queue entry while enrolling dave."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.person_store import (
        Person,
        PersonStore,
    )

    binary = _build_demo(str(tmp_path))
    rng = np.random.default_rng(5)
    pdb = os.path.join(str(tmp_path), "seeded.fjpd")
    store = PersonStore(os.path.join(str(tmp_path), "seed.sqlite"),
                        feature_dim=342)
    try:
        carol = store.register_person(
            Person(name="carol", student_id="C1"),
            features=[rng.normal(size=342).astype(np.float32)])
        store.register_card_only(
            "card-7", [rng.normal(size=342).astype(np.float32)])
        store.export_fjpd(pdb)
    finally:
        store.close()
    cmd = [binary, "--video", fixtures["video"], "--mtcnn",
           fixtures["mtcnn"], "--weights", fixtures["export"],
           "--model", "efmnet342", "--person-db", pdb,
           "--register-name", "dave", "--register-frames", "2",
           "--image-size", "32", "--th", "0.45", "0.35", "0.3",
           "--sim-th", "0.3"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    s = re.search(r"persons=(\d+) person_faces=(\d+)", r.stdout)
    assert s and int(s.group(1)) == 2, r.stdout[-1500:]  # carol + dave
    # reload in Python: carol intact, dave added, queue preserved
    back = PersonStore(os.path.join(str(tmp_path), "back.sqlite"),
                       feature_dim=342)
    try:
        back.import_fjpd(pdb)
        names = {p.name for p in back.persons()}
        assert {"carol", "dave"} <= names
        assert back.get_person(carol).name == "carol"
        pend = back.pending_registrations()
        assert len(pend) == 1 and pend[0][1] == "card-7"
    finally:
        back.close()


def test_demo_card_only_register_and_promote(fixtures, tmp_path):
    """Register_PDB_onlyCard in the binary: --register-card parks the
    selected views under the TMP person (they identify NOTHING — rc 2,
    identified=0), while --promote-name turns the pending registration
    into a real person who then identifies; the queue state and card
    inheritance are visible from the Python store."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.person_store import (
        PersonStore,
    )

    binary = _build_demo(str(tmp_path))
    pdb = os.path.join(str(tmp_path), "card.fjpd")
    base = [binary, "--video", fixtures["video"], "--mtcnn",
            fixtures["mtcnn"], "--weights", fixtures["export"],
            "--model", "efmnet342", "--person-db", pdb,
            "--register-frames", "2", "--image-size", "32",
            "--th", "0.45", "0.35", "0.3", "--sim-th", "0.3"]

    # card-only, no promote: parked faces are invisible to matching
    r = subprocess.run(base + ["--register-card", "card-42"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 2, f"{r.stdout[-1500:]}\n{r.stderr[-800:]}"
    assert re.search(r"card-registered 'card-42': rid=1 pending=1",
                     r.stdout), r.stdout[-1500:]
    assert re.search(r"identified=0", r.stdout)

    # card-only + promote: same acquisition, now identifies as eve
    os.remove(pdb)
    r2 = subprocess.run(base + ["--register-card", "card-42",
                                "--promote-name", "eve"],
                        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, f"{r2.stdout[-1500:]}\n{r2.stderr[-800:]}"
    assert re.search(r"promoted rid=1 -> pid=\d+ 'eve'", r2.stdout)
    assert re.search(r"top=eve", r2.stdout), r2.stdout[-1500:]

    store = PersonStore(os.path.join(str(tmp_path), "card_rt.sqlite"),
                        feature_dim=342)
    try:
        store.import_fjpd(pdb)
        assert store.pending_registrations() == []
        eve = store.find_by_card("card-42")
        assert eve is not None and eve.name == "eve"
    finally:
        store.close()

    # guards: card flow requires the person-level store; name XOR card
    r3 = subprocess.run(
        [binary, "--video", fixtures["video"], "--mtcnn",
         fixtures["mtcnn"], "--weights", fixtures["export"],
         "--store", os.path.join(str(tmp_path), "x.fjdb"),
         "--register-card", "c"],
        capture_output=True, text=True, timeout=60)
    assert r3.returncode == 1 and "usage:" in r3.stderr


def test_demo_person_db_never_clobbers_unreadable_store(fixtures, tmp_path):
    """Opening an existing .fjpd the binary cannot read (corrupt bytes /
    wrong dim) must NEVER destroy it: the original bytes are moved aside
    to <db>.corrupt before the fresh store's first persist (round-4
    review finding — the old constructor overwrote the file in place)."""
    binary = _build_demo(str(tmp_path))
    pdb = os.path.join(str(tmp_path), "precious.fjpd")
    garbage = b"FJPD-but-not-really " + bytes(range(256)) * 8
    with open(pdb, "wb") as f:
        f.write(garbage)
    r = subprocess.run(
        [binary, "--video", fixtures["video"], "--mtcnn",
         fixtures["mtcnn"], "--weights", fixtures["export"],
         "--model", "efmnet342", "--person-db", pdb,
         "--register-frames", "2", "--image-size", "32",
         "--th", "0.45", "0.35", "0.3", "--register-name", "alice"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    with open(pdb + ".corrupt", "rb") as f:
        assert f.read() == garbage
    # and the replacement store is a valid fresh FJPD
    with open(pdb, "rb") as f:
        assert f.read(4) == b"FJPD"
