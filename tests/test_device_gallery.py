"""DeviceGallery: device-resident identity matrix with O(row) enrollment
(serve/device_gallery.py) feeding the dynamic pipelines' (gallery_n, rows)
contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.serve.device_gallery import (
    DeviceGallery,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
    normalize_gallery,
)


def test_add_matches_host_normalization():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(5, 16)).astype(np.float32)
    dg = DeviceGallery(dim=16, capacity=8)
    for i, v in enumerate(vecs):
        assert dg.add(v) == i
    assert dg.rows == 5 and dg.capacity == 8
    np.testing.assert_allclose(dg.to_host(),
                               np.asarray(normalize_gallery(vecs)),
                               atol=1e-6)
    # padding stays zero
    np.testing.assert_array_equal(np.asarray(dg.gallery_n[5:]), 0.0)


def test_capacity_doubles_and_preserves_rows():
    rng = np.random.default_rng(1)
    dg = DeviceGallery(dim=8, capacity=2)
    vecs = rng.normal(size=(5, 8)).astype(np.float32)
    for v in vecs:
        dg.add(v)
    assert dg.capacity == 8 and dg.rows == 5  # 2 -> 4 -> 8
    np.testing.assert_allclose(dg.to_host(),
                               np.asarray(normalize_gallery(vecs)), atol=1e-6)


def test_initial_rows_and_update_delete():
    rng = np.random.default_rng(2)
    init = rng.normal(size=(3, 8)).astype(np.float32)
    dg = DeviceGallery(dim=8, capacity=2, initial=init)
    assert dg.capacity == 4 and dg.rows == 3
    np.testing.assert_allclose(dg.to_host(),
                               np.asarray(normalize_gallery(init)), atol=1e-6)
    new = rng.normal(size=8).astype(np.float32)
    dg.set_row(1, new)
    np.testing.assert_allclose(np.asarray(dg.gallery_n[1]),
                               np.asarray(normalize_gallery(new[None]))[0],
                               atol=1e-6)
    dg.clear_row(1)
    np.testing.assert_array_equal(np.asarray(dg.gallery_n[1]), 0.0)
    with pytest.raises(IndexError):
        dg.set_row(3, new)
    with pytest.raises(IndexError):
        dg.clear_row(-1)
    with pytest.raises(ValueError):
        dg.add(np.zeros((4,), np.float32))
    with pytest.raises(ValueError):
        DeviceGallery(dim=8, capacity=0)


def test_enrollment_does_not_reupload_gallery():
    """add() moves O(D) bytes, not O(capacity x D): the device buffer is
    donated in place. We can't count bytes portably, but we CAN pin the
    contract that the buffer object is consumed (donation) and the result
    differs only at the written row."""
    rng = np.random.default_rng(3)
    dg = DeviceGallery(dim=8, capacity=16)
    dg.add(rng.normal(size=8).astype(np.float32))
    before = np.asarray(dg.gallery_n)
    dg.add(rng.normal(size=8).astype(np.float32))
    after = np.asarray(dg.gallery_n)
    changed = np.any(before != after, axis=1)
    assert changed[1] and not changed[0] and not changed[2:].any()


def test_set_row_validates_shape():
    """set_row rejects wrong-shaped vectors loudly (a scalar would
    otherwise silently broadcast into a constant row after normalize)."""
    dg = DeviceGallery(dim=8, capacity=4)
    dg.add(np.ones(8, np.float32))
    with pytest.raises(ValueError):
        dg.set_row(0, np.float32(0.5))
    with pytest.raises(ValueError):
        dg.set_row(0, np.zeros((4,), np.float32))


def test_from_rows_compacts_tombstones():
    """The documented clear_row -> from_rows compaction workflow: deleted
    rows drop out, survivors keep their (normalized) values, and the
    cumsum remap gives the new row ids."""
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(5, 8)).astype(np.float32)
    dg = DeviceGallery(dim=8, capacity=8, initial=vecs)
    dg.clear_row(1)
    dg.clear_row(3)
    keep = np.ones(dg.rows, bool)
    keep[[1, 3]] = False
    dg2 = DeviceGallery.from_rows(dg.to_host(), capacity=4, keep=keep)
    assert dg2.rows == 3 and dg2.capacity == 4
    np.testing.assert_allclose(
        dg2.to_host(), np.asarray(normalize_gallery(vecs[[0, 2, 4]])),
        atol=1e-6)
    remap = np.cumsum(keep) - 1
    assert remap[4] == 2  # old row 4 -> new row 2
    with pytest.raises(ValueError):
        DeviceGallery.from_rows(vecs[0])  # 1-D rejected


def test_bf16_storage_dtype():
    """dtype=bf16 halves the matrix's HBM bytes; rows still normalize in
    f32 and read back within bf16 narrowing error, across add/grow/
    set_row/clear_row and the sharded mode."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(5, 16)).astype(np.float32)
    dg = DeviceGallery(dim=16, capacity=2, dtype=jnp.bfloat16)
    for v in vecs:
        dg.add(v)
    assert dg.gallery_n.dtype == jnp.bfloat16  # survives _grow
    ref = np.asarray(normalize_gallery(vecs))
    np.testing.assert_allclose(dg.to_host(), ref, atol=1e-2)
    assert dg.to_host().dtype == np.float32
    dg.set_row(2, vecs[0])
    assert dg.gallery_n.dtype == jnp.bfloat16
    dg.clear_row(1)
    np.testing.assert_array_equal(np.asarray(dg.gallery_n[1]), 0.0)

    # initial-rows path + sharded mode keep the dtype too
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    dg2 = DeviceGallery(dim=16, capacity=4, initial=vecs, mesh=mesh,
                        dtype=jnp.bfloat16)
    assert dg2.gallery_n.dtype == jnp.bfloat16
    np.testing.assert_allclose(dg2.to_host(), ref, atol=1e-2)
    dg2.add(vecs[0])
    assert dg2.gallery_n.dtype == jnp.bfloat16

    # int8 storage: 127-scale rows on device, rescaled by to_host; quant
    # error bounded by half a grid step per element (plus slack for the
    # device-vs-host normalize last-bit gap)
    dg8 = DeviceGallery(dim=16, capacity=2, dtype=jnp.int8)
    for v in vecs:
        dg8.add(v)
    assert dg8.gallery_n.dtype == jnp.int8
    np.testing.assert_allclose(dg8.to_host(), ref, atol=0.5 / 127 + 1e-5)
    # host-narrowed (initial) and device-narrowed (add) rows agree to one
    # quantization grid step (exact equality would pin backend rounding)
    dg8i = DeviceGallery(dim=16, capacity=8, initial=vecs, dtype=jnp.int8)
    diff = (np.asarray(dg8i.gallery_n[:5], np.int32)
            - np.asarray(dg8.gallery_n[:5], np.int32))
    assert np.abs(diff).max() <= 1


def test_sharded_gallery_matches_shard_gallery():
    """DeviceGallery(mesh=...) produces bit-identical (matrix, sharding)
    to serve.pipeline.shard_gallery's re-upload path — so the
    gallery-sharded pipeline sees the same inputs — while enrollment stays
    an O(row) donated scatter that lands on one shard."""
    from jax.sharding import Mesh

    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        shard_gallery,
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(7, 16)).astype(np.float32)

    dg = DeviceGallery(dim=16, capacity=2, mesh=mesh)
    for v in vecs:
        dg.add(v)
    assert dg.rows == 7 and dg.capacity == 8  # 2 -> 4 -> 8, axis multiple

    gal_ref, rows_ref = shard_gallery(vecs, mesh)  # pads 7 -> 8
    assert rows_ref == 7 and gal_ref.shape == (8, 16)
    np.testing.assert_allclose(np.asarray(dg.gallery_n),
                               np.asarray(gal_ref), atol=1e-6)
    assert dg.gallery_n.sharding == gal_ref.sharding

    # mutations preserve the sharding (out_shardings pins the scatter)
    dg.set_row(3, rng.normal(size=16).astype(np.float32))
    assert dg.gallery_n.sharding == gal_ref.sharding
    dg.clear_row(3)
    assert dg.gallery_n.sharding == gal_ref.sharding
    np.testing.assert_array_equal(np.asarray(dg.gallery_n[3]), 0.0)

    # capacity rounds up to an axis multiple; from_rows carries the mesh
    dg2 = DeviceGallery.from_rows(vecs, capacity=3, mesh=mesh)
    assert dg2.capacity % 2 == 0 and dg2.rows == 7
    assert dg2.gallery_n.sharding == gal_ref.sharding
    np.testing.assert_allclose(dg2.to_host(),
                               np.asarray(normalize_gallery(vecs)),
                               atol=1e-6)


def test_feeds_dynamic_pipeline_match():
    """(gallery_n, rows_arg) plug into the dynamic match contract: the
    enrolled rows win, capacity padding is masked."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        _match_gallery,
    )

    rng = np.random.default_rng(4)
    dg = DeviceGallery(dim=8, capacity=8)
    target = rng.normal(size=8).astype(np.float32)
    dg.add(rng.normal(size=8).astype(np.float32))
    row = dg.add(target)
    probe = np.asarray(normalize_gallery(target[None]))[0]
    idx, sim, real = _match_gallery(dg.gallery_n @ probe, dg.rows_arg)
    assert int(idx) == row and bool(real)
    assert float(sim) == pytest.approx(1.0, abs=1e-5)
