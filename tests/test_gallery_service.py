"""PersonGalleryService: the durable-DB <-> HBM-gallery bridge
(serve/gallery_service.py). Pins that the device match path resolved
through the service agrees person-for-person with PersonStore.match_batch
(Compare_Face_DB semantics), across cold start, write-through enrollment,
soft deletes, and refresh/compaction."""

import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.ops.distances import (
    l2_normalize_np,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.gallery_service import (
    PersonGalleryService,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.person_store import (
    Person,
    PersonStore,
)

DIM = 32


def _clustered(n_ids=4, per_id=3, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_ids, DIM)).astype(np.float32) * 4
    feats = np.concatenate([
        centers[i] + rng.normal(size=(per_id, DIM)).astype(np.float32) * 0.05
        for i in range(n_ids)])
    labels = np.repeat(np.arange(n_ids), per_id)
    return feats, labels


def _device_match(svc, probes):
    """The pipelines' device match contract: [N, D] normalized probes
    against (gallery_n, rows_arg)."""
    import jax.numpy as jnp

    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        _match_gallery,
    )

    probes_n = jnp.asarray(l2_normalize_np(probes))
    idx, sim, real = _match_gallery(probes_n @ svc.gallery_n.T, svc.rows_arg)
    return np.asarray(idx), np.asarray(sim), np.asarray(real)


def test_cold_start_matches_store(tmp_path):
    feats, labels = _clustered()
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        for ident in np.unique(labels):
            store.register_person(Person(name=f"person{ident}"),
                                  list(feats[labels == ident]))
        svc = PersonGalleryService(store, capacity=4)
        assert svc.rows == len(feats)

        idx, sim, real = _device_match(svc, feats)
        resolved = svc.resolve_batch(idx, sim, sim_th=0.6)
        host = store.match_batch(feats, sim_th=0.6, use_tpu=False)
        for r, h in zip(resolved, host):
            assert (r.person is None) == (h.person is None)
            assert r.person.pid == h.person.pid
            assert r.similarity == pytest.approx(h.similarity, abs=1e-5)

        # the one-call form agrees too (and takes a single 1-D probe)
        for r, h in zip(svc.match_batch(feats, sim_th=0.6), host):
            assert r.person.pid == h.person.pid
            assert r.similarity == pytest.approx(h.similarity, abs=1e-5)
        one = svc.match_batch(feats[0], sim_th=0.6)
        assert len(one) == 1 and one[0].person.pid == host[0].person.pid
        # empty gallery: PersonStore.match's (None, 0.0) parity
        with PersonStore(str(tmp_path / "e.sqlite"), DIM) as empty_store:
            empty = PersonGalleryService(empty_store).match_batch(feats[:2])
            assert all(r.person is None and r.similarity == 0.0
                       for r in empty)


def test_write_through_enroll_and_add_face(tmp_path):
    feats, labels = _clustered()
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        svc = PersonGalleryService(store, capacity=4)
        assert svc.rows == 0
        pid = svc.enroll(Person(name="alice"), feats[labels == 0])
        fid = svc.add_face(pid, feats[labels == 0][0] * 1.01)
        assert fid > 0 and svc.rows == 4

        # device match resolves to alice WITHOUT any refresh
        idx, sim, _ = _device_match(svc, feats[labels == 0][:1])
        res = svc.resolve(int(idx[0]), float(sim[0]))
        assert res.person is not None and res.person.pid == pid
        # and it is durable: a fresh service over the same DB agrees
        svc2 = PersonGalleryService(store)
        assert svc2.rows == 4
        idx2, sim2, _ = _device_match(svc2, feats[labels == 0][:1])
        assert svc2.resolve(int(idx2[0]), float(sim2[0])).person.pid == pid

        with pytest.raises(KeyError):
            svc.add_face(9999, feats[0])

    # durability across CONNECTIONS, not just service instances: reopen
    # the DB file cold (uncommitted add_face rows would be rolled back)
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store2:
        svc3 = PersonGalleryService(store2)
        assert svc3.rows == 4
        idx3, sim3, _ = _device_match(svc3, feats[labels == 0][:1])
        assert svc3.resolve(int(idx3[0]), float(sim3[0])).person.pid == pid


def test_retire_tombstones_then_refresh_compacts(tmp_path):
    feats, labels = _clustered()
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        pids = {}
        for ident in np.unique(labels):
            pids[ident] = store.register_person(
                Person(name=f"person{ident}"), list(feats[labels == ident]))
        svc = PersonGalleryService(store)
        n = svc.retire_person(pids[1])
        assert n == 3

        # tombstoned rows never win: probe person1's own faces
        probes = feats[labels == 1]
        idx, sim, _ = _device_match(svc, probes)
        for r in svc.resolve_batch(idx, sim, sim_th=-1.0):
            assert r.person is None or r.person.pid != pids[1]
        # the store agrees (person_flag=0 left the valid views)
        for h in store.match_batch(probes, sim_th=0.6, use_tpu=False):
            assert h.person is None or h.person.pid != pids[1]

        # refresh compacts the tombstones and stays consistent
        svc.refresh()
        assert svc.rows == len(feats) - 3
        idx, sim, _ = _device_match(svc, feats)
        resolved = svc.resolve_batch(idx, sim, sim_th=0.6)
        host = store.match_batch(feats, sim_th=0.6, use_tpu=False)
        for r, h in zip(resolved, host):
            assert (r.person is None) == (h.person is None)
            if h.person is not None:
                assert r.person.pid == h.person.pid

        # flag restore + refresh brings the person back
        store.set_person_flag(pids[1], 1)
        svc.refresh()
        assert svc.rows == len(feats)
        with pytest.raises(KeyError):
            store.set_person_flag(9999, 0)
        with pytest.raises(ValueError):
            store.set_person_flag(0, 1)


def test_out_of_band_write_needs_refresh(tmp_path):
    feats, _ = _clustered()
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        svc = PersonGalleryService(store)
        pid = store.register_person(Person(name="late"), [feats[0]])
        assert svc.rows == 0  # not visible until refresh (documented)
        svc.refresh()
        assert svc.rows == 1
        idx, sim, _ = _device_match(svc, feats[:1])
        assert svc.resolve(int(idx[0]), float(sim[0])).person.pid == pid


def test_resolve_edges(tmp_path):
    feats, _ = _clustered()
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        svc = PersonGalleryService(store)
        assert svc.resolve(-1, -2.0).person is None
        assert svc.resolve(5, 0.9).person is None  # out of range
        pid = svc.enroll(Person(name="a"), feats[:1])
        assert svc.resolve(0, 0.4, sim_th=0.5).person is None  # below th
        assert svc.resolve(0, 0.6, sim_th=0.5).person.pid == pid


def test_sharded_service_matches_unsharded(tmp_path):
    """mesh= shards the service's device rows; match results are
    identical to the unsharded service."""
    import jax
    from jax.sharding import Mesh

    feats, labels = _clustered()
    with PersonStore(str(tmp_path / "p.sqlite"), DIM) as store:
        for ident in np.unique(labels):
            store.register_person(Person(name=f"person{ident}"),
                                  list(feats[labels == ident]))
        mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        svc_s = PersonGalleryService(store, mesh=mesh)
        svc = PersonGalleryService(store)
        assert svc_s.rows == svc.rows
        np.testing.assert_allclose(
            np.asarray(svc_s.gallery_n)[:svc.rows],
            np.asarray(svc.gallery_n)[:svc.rows], atol=1e-6)
        pid = svc_s.enroll(Person(name="extra"),
                           [np.ones(DIM, np.float32)])
        idx, sim, _ = _device_match(svc_s, np.ones((1, DIM), np.float32))
        assert svc_s.resolve(int(idx[0]), float(sim[0])).person.pid == pid
