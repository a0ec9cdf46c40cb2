"""Person-level identity DB (reference C20: Feature.hpp:679-932 —
Register_PDB / Register_PDB_onlyCard / isExistIDNumber / Compare_Face_DB
semantics on sqlite, plus reg_face flat-schema interop)."""

import os
import sqlite3

import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (
    synthetic_features,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.person_store import (
    Person,
    PersonStore,
    TMP_PID,
)

DIM = 32


def _clustered(n_ids=3, per_id=4, seed=0):
    return synthetic_features(num_ids=n_ids, per_id=per_id, dim=DIM,
                              noise=0.1, seed=seed)


def test_register_and_match_person(tmp_path):
    feats, labels = _clustered()
    db = str(tmp_path / "p.sqlite")
    with PersonStore(db, DIM) as store:
        pids = {}
        for ident in np.unique(labels):
            pids[int(ident)] = store.register_person(
                Person(name=f"person{ident}", student_id=f"90{ident}"),
                list(feats[labels == ident]))
        # every probe matches its own person at high sim
        for i, fv in enumerate(feats):
            res = store.match(fv, sim_th=0.5)
            assert res.person is not None
            assert res.person.pid == pids[int(labels[i])]
            assert res.similarity > 0.9
        # an orthogonal-ish probe stays below threshold
        probe = np.zeros(DIM, np.float32)
        probe[0] = 1.0
        res = store.match(probe, sim_th=0.99)
        assert res.person is None


def test_n_faces_per_person_relation(tmp_path):
    feats, labels = _clustered(n_ids=2, per_id=5)
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        pid = store.register_person(Person(name="a"),
                                    list(feats[labels == 0]))
        assert store.faces_of(pid).shape == (5, DIM)
        np.testing.assert_allclose(store.faces_of(pid),
                                   feats[labels == 0], rtol=1e-6)


def test_exists_id_number_atol_semantics(tmp_path):
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        store.register_person(Person(name="x", student_id="00123"))
        store.register_person(Person(name="y", student_id="not-a-number"))
        p = store.exists_id_number(123)  # atol('00123') == 123
        assert p is not None and p.name == "x"
        assert store.exists_id_number(999) is None


def test_card_only_registration_and_promote(tmp_path):
    feats, labels = _clustered(n_ids=2, per_id=3)
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        rid = store.register_card_only("CARD42", list(feats[labels == 0]))
        # parked faces live under TMP and are invisible to matching
        res = store.match(feats[labels == 0][0], sim_th=0.5)
        assert res.person is None
        pending = store.pending_registrations()
        assert len(pending) == 1
        assert pending[0][0] == rid and pending[0][1] == "CARD42"
        assert len(pending[0][2]) == 3

        pid = store.promote_registration(rid, Person(name="bob",
                                                     student_id="777"))
        assert store.pending_registrations() == []
        p = store.get_person(pid)
        assert p.card_id == "CARD42"  # card id carried from the queue
        # faces re-homed: now matchable
        res = store.match(feats[labels == 0][0], sim_th=0.5)
        assert res.person is not None and res.person.pid == pid
        # TMP person itself never matches
        assert store.faces_of(TMP_PID).shape[0] == 0


def test_invalid_person_excluded_from_matching(tmp_path):
    feats, labels = _clustered(n_ids=2, per_id=2)
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        store.register_person(Person(name="gone", person_flag=0),
                              list(feats[labels == 0]))
        keep = store.register_person(Person(name="kept"),
                                     list(feats[labels == 1]))
        res = store.match(feats[labels == 0][0], sim_th=0.5)
        # flagged-invalid person's faces are out of valid_face
        assert res.person is None or res.person.pid == keep
        assert [p.name for p in store.persons()] == ["kept"]


def test_crop_directory_contract(tmp_path):
    """Crops land under not_verify/<student_id>/ and regist_list/<rid>/
    exactly like the reference's data-root layout."""
    pytest.importorskip("cv2")
    root = str(tmp_path / "root")
    img = np.full((8, 8, 3), 128, np.uint8)
    fv = np.ones(DIM, np.float32)
    with PersonStore(str(tmp_path / "p.sqlite"), DIM,
                     data_root=root) as store:
        store.register_person(Person(name="a", student_id="55"), [fv],
                              crops=[img], profile_img=img)
        assert os.path.exists(os.path.join(root, "not_verify/55/profile.png"))
        files = os.listdir(os.path.join(root, "not_verify/55"))
        assert any(f != "profile.png" and f.endswith(".png") for f in files)


def test_reg_face_export_import_roundtrip(tmp_path):
    feats, labels = _clustered(n_ids=2, per_id=2)
    src_db = str(tmp_path / "p.sqlite")
    flat = str(tmp_path / "reg_face.sqlite")
    with PersonStore(src_db, DIM) as store:
        for ident in np.unique(labels):
            store.register_person(Person(name=f"n{ident}"),
                                  list(feats[labels == ident]))
        n = store.export_reg_face(flat)
    assert n == 4
    # flat schema is the C version's exact table
    con = sqlite3.connect(flat)
    cols = [r[1] for r in con.execute("PRAGMA table_info(reg_face)")]
    assert cols == ["IDS", "NAME", "FEATEXE", "SIMD_DOT"]
    con.close()

    with PersonStore(str(tmp_path / "q.sqlite"), DIM) as store2:
        added = store2.import_reg_face(flat)
        assert added == 4
        # re-import dedups at >0.99999 (Register_DB_File guard)
        assert store2.import_reg_face(flat) == 0
        res = store2.match(feats[0], sim_th=0.5)
        assert res.person is not None and res.person.name == f"n{labels[0]}"


def test_identify_cli_person_flows(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        identify,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
        feature_store,
    )

    feats, labels = _clustered(n_ids=2, per_id=3)
    fpath = str(tmp_path / "f.npz")
    feature_store.save_feature_store(fpath, feats, labels)
    db = str(tmp_path / "persons.sqlite")

    pid = identify.main(["enroll-person", "--store", db, "--features",
                         fpath, "--label", "0", "--name", "alice",
                         "--student-id", "901"])
    results = identify.main(["match-person", "--store", db, "--features",
                             fpath, "--sim-th", "0.5"])
    own = [r for r in results if r["label"] == 0]
    assert all(r["pid"] == pid for r in own)

    rid = identify.main(["register-card", "--store", db, "--features",
                         fpath, "--label", "1", "--card-id", "C9"])
    identify.main(["promote", "--store", db, "--rid", str(rid),
                   "--name", "bob", "--student-id", "902"])
    p = identify.main(["lookup-id", "--store", db, "--id-number", "902"])
    assert p is not None and p.name == "bob" and p.card_id == "C9"


def test_match_batch_tpu_equals_host(tmp_path):
    """Bulk Compare_Face_DB (ONE device matmul) must agree with the
    per-probe host scan, person for person, incl. below-threshold probes
    and the empty-store case."""
    feats, labels = _clustered()
    db = str(tmp_path / "pb.sqlite")
    with PersonStore(db, DIM) as store:
        # empty store: no person, similarity 0 (host parity)
        empty = store.match_batch(feats[:2])
        assert len(empty) == 2
        assert all(r.person is None and r.similarity == 0.0 for r in empty)
        for ident in np.unique(labels):
            store.register_person(
                Person(name=f"person{ident}"), list(feats[labels == ident]))
        probes = np.concatenate([feats, np.eye(DIM, dtype=np.float32)[:1]])
        host = [store.match(fv, sim_th=0.6) for fv in probes]
        bulk = store.match_batch(probes, sim_th=0.6)
        loop = store.match_batch(probes, sim_th=0.6, use_tpu=False)
        assert len(bulk) == len(host) == len(loop)
        for h, b, l in zip(host, bulk, loop):
            assert (h.person is None) == (b.person is None) == (
                l.person is None)
            if h.person is not None:
                assert h.person.pid == b.person.pid == l.person.pid
                assert h.fid == b.fid
            assert b.similarity == pytest.approx(h.similarity, abs=1e-5)
        # the unenrolled probe is below threshold in all paths
        assert bulk[-1].person is None
        # a single 1-D probe is accepted like match() accepts it
        single = store.match_batch(probes[0], sim_th=0.6)
        assert len(single) == 1
        assert single[0].person.pid == host[0].person.pid


def test_identify_cli_match_person_tpu(tmp_path):
    """`identify match-person --tpu` returns the host path's results."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        identify,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
        save_feature_store,
    )

    feats, labels = _clustered()
    db = str(tmp_path / "pc.sqlite")
    with PersonStore(db, DIM) as store:
        for ident in np.unique(labels):
            store.register_person(
                Person(name=f"person{ident}"), list(feats[labels == ident]))
    probes = str(tmp_path / "probes.npz")
    save_feature_store(probes, feats, labels)
    host = identify.main(["match-person", "--store", db,
                          "--features", probes, "--sim-th", "0.6"])
    tpu = identify.main(["match-person", "--store", db,
                         "--features", probes, "--sim-th", "0.6", "--tpu"])
    assert [r["pid"] for r in tpu] == [r["pid"] for r in host]
    for a, b in zip(tpu, host):
        assert a["similarity"] == pytest.approx(b["similarity"], abs=1e-5)
    # the HBM-resident gallery path (PersonGalleryService) agrees too
    dg = identify.main(["match-person", "--store", db, "--features",
                        probes, "--sim-th", "0.6", "--device-gallery"])
    assert [r["pid"] for r in dg] == [r["pid"] for r in host]
    for a, b in zip(dg, host):
        assert a["similarity"] == pytest.approx(b["similarity"], abs=1e-5)
    # int8 storage: same persons on this clustered gallery, sims within
    # the quantization bound
    dg8 = identify.main(["match-person", "--store", db, "--features",
                         probes, "--sim-th", "0.6", "--device-gallery",
                         "--gallery-dtype", "int8"])
    assert [r["pid"] for r in dg8] == [r["pid"] for r in host]
    for a, b in zip(dg8, host):
        assert a["similarity"] == pytest.approx(b["similarity"], abs=2e-2)
    with pytest.raises(SystemExit):
        identify.main(["match-person", "--store", db, "--features", probes,
                       "--tpu", "--device-gallery"])


def test_fjpd_export_import_roundtrip(tmp_path):
    """FJPD (the native person_store.hpp binary) round-trips the FULL
    relational state through Python alone: persons (incl. a soft-deleted
    one), N faces per person with preserved fids/pids, and the card-only
    pre-registration queue."""
    rng = np.random.default_rng(3)
    src = PersonStore(str(tmp_path / "src.sqlite"), feature_dim=16)
    f_alice = [rng.normal(size=16).astype(np.float32) for _ in range(3)]
    alice = src.register_person(
        Person(name="alice", role_title="phd", email="a@x", student_id="S1",
               card_id="CA"), features=f_alice)
    bob = src.register_person(Person(name="bob"),
                              features=[rng.normal(size=16)
                                        .astype(np.float32)])
    src.set_person_flag(bob, 0)  # soft-deleted: must survive the trip
    rid = src.register_card_only(
        "card-9", [rng.normal(size=16).astype(np.float32)])
    src.export_fjpd(str(tmp_path / "x.fjpd"))

    dst = PersonStore(str(tmp_path / "dst.sqlite"), feature_dim=16)
    n_p, n_f = dst.import_fjpd(str(tmp_path / "x.fjpd"))
    assert n_p == 3 and n_f == 5  # TMP + alice + bob; 3 + 1 + 1 faces
    a2 = dst.get_person(alice)
    assert (a2.name, a2.role_title, a2.email, a2.student_id, a2.card_id) \
        == ("alice", "phd", "a@x", "S1", "CA")
    np.testing.assert_allclose(dst.faces_of(alice),
                               np.stack(f_alice), rtol=1e-6)
    assert dst.get_person(bob).person_flag == 0
    assert dst.match(f_alice[1], 0.5).person.pid == alice
    assert dst.match(dst.faces_of(bob)[0] if len(dst.faces_of(bob))
                     else np.zeros(16, np.float32), 0.99).person is None
    pend = dst.pending_registrations()
    assert pend == src.pending_registrations() and pend[0][0] == rid
    # promote works on the imported copy exactly like the original
    carol = dst.promote_registration(rid, Person(name="carol"))
    assert dst.get_person(carol).card_id == "card-9"
    # import into a non-empty store is refused (id collisions)
    with pytest.raises(ValueError):
        dst.import_fjpd(str(tmp_path / "x.fjpd"))
    src.close()
    dst.close()


def test_fjpd_preserves_id_counters_after_promote(tmp_path):
    """Promoted rids (and their fids/pids) must never be reissued after
    an FJPD round trip: the header carries sqlite's AUTOINCREMENT
    counters, export reads them from sqlite_sequence (not max over
    surviving rows) and import restores them."""
    rng = np.random.default_rng(11)
    src = PersonStore(str(tmp_path / "s.sqlite"), feature_dim=8)
    rid1 = src.register_card_only(
        "c1", [rng.normal(size=8).astype(np.float32)])
    src.promote_registration(rid1, Person(name="promoted"))
    src.export_fjpd(str(tmp_path / "s.fjpd"))

    dst = PersonStore(str(tmp_path / "d.sqlite"), feature_dim=8)
    dst.import_fjpd(str(tmp_path / "s.fjpd"))
    rid2 = dst.register_card_only(
        "c2", [rng.normal(size=8).astype(np.float32)])
    assert rid2 > rid1, (rid2, rid1)  # rid1's regist_list/1/ is retired
    src.close()
    dst.close()


def test_fjpd_import_rejects_corrupt_files(tmp_path):
    """Untrusted-input discipline for the interchange parser: wrong
    magic/version/dim raise ValueError; truncation raises a clean error
    (struct.error/ValueError), never silently half-imports — and a
    failed import leaves the store usable and still empty."""
    import struct

    rng = np.random.default_rng(0)
    src = PersonStore(str(tmp_path / "src.sqlite"), feature_dim=8)
    src.register_person(Person(name="a"),
                        features=[rng.normal(size=8).astype(np.float32)])
    good = str(tmp_path / "good.fjpd")
    src.export_fjpd(good)
    blob = open(good, "rb").read()

    counter = [0]

    def attempt(data):
        counter[0] += 1
        path = str(tmp_path / "bad.fjpd")
        with open(path, "wb") as f:
            f.write(data)
        dst = PersonStore(str(tmp_path / f"d{counter[0]}.sqlite"),
                          feature_dim=8)
        try:
            with pytest.raises((ValueError, struct.error, EOFError)):
                dst.import_fjpd(path)
            assert dst.persons() == [] and dst.match(
                np.ones(8, np.float32), 0.0).person is None
            # the store still works after the failed import
            pid = dst.register_person(Person(name="ok"))
            assert dst.get_person(pid).name == "ok"
        finally:
            dst.close()

    attempt(b"NOTF" + blob[4:])                      # wrong magic
    attempt(blob[:4] + struct.pack("<I", 9) + blob[8:])   # bad version
    attempt(blob[:8] + struct.pack("<I", 999) + blob[12:])  # dim mismatch
    attempt(blob[: len(blob) // 2])                  # truncated mid-record
    # truncated INSIDE the final face's raw feature blob: unlike every
    # struct.unpack field, a short f.read on the blob returns quietly,
    # so this is the one cut the parser must check by length (round-4
    # review finding)
    attempt(blob[:-5])
    # oversized string length field: flip a person-name length to 2^30
    attempt(blob[:44] + struct.pack("<I", 1 << 30) + blob[48:])
    src.close()
