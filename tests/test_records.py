"""Image stores + device-side augmentation (reference ImageRecordIter
replacement: scale=1/255, rand_mirror, rand_crop — train_efm.py:179)."""

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
    records as R,
)


def test_image_store_roundtrip_uint8(tmp_path):
    rng = np.random.default_rng(0)
    imgs = (rng.random((5, 8, 8, 1)) * 255).astype(np.uint8)
    labels = np.arange(5)
    p = str(tmp_path / "store.npz")
    R.save_image_store(p, imgs, labels)
    i2, l2 = R.load_image_store(p)
    np.testing.assert_array_equal(i2, imgs)
    np.testing.assert_array_equal(l2, labels)


def test_image_store_float_input_quantized(tmp_path):
    imgs = np.full((2, 4, 4, 1), 0.5, np.float32)
    p = str(tmp_path / "s.npz")
    R.save_image_store(p, imgs, np.zeros(2))
    i2, _ = R.load_image_store(p)
    assert i2.dtype == np.uint8
    assert int(i2[0, 0, 0, 0]) in (127, 128)


def test_mmap_store_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    imgs = (rng.random((4, 6, 6, 3)) * 255).astype(np.uint8)
    d = str(tmp_path / "mm")
    R.save_image_store_mmap(d, imgs, np.arange(4))
    i2, l2 = R.load_image_store_mmap(d)
    assert isinstance(i2, np.memmap)
    np.testing.assert_array_equal(np.asarray(i2), imgs)


def test_normalize_uint8():
    x = jnp.asarray([[0, 255, 51]], jnp.uint8)
    out = R.normalize_uint8(x)
    np.testing.assert_allclose(np.asarray(out), [[0.0, 1.0, 0.2]], rtol=1e-6)


def test_augment_mirror_flips_some_rows():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((16, 4, 6, 1)).astype(np.float32))
    out = np.asarray(R.augment_batch(jax.random.PRNGKey(0), imgs,
                                     mirror=True))
    flipped = 0
    for i in range(16):
        orig = np.asarray(imgs[i])
        if np.allclose(out[i], orig[:, ::-1, :]) and not np.allclose(
                out[i], orig):
            flipped += 1
        else:
            np.testing.assert_allclose(out[i], orig)
    assert 0 < flipped < 16  # bernoulli(0.5) per row


def test_augment_crop_shapes_and_content():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((4, 10, 10, 2)).astype(np.float32))
    out = R.augment_batch(jax.random.PRNGKey(1), imgs, mirror=False,
                          crop_size=6)
    assert out.shape == (4, 6, 6, 2)
    # each crop is a contiguous window of the source image
    src = np.asarray(imgs[0])
    crop = np.asarray(out[0])
    found = any(
        np.allclose(src[y:y + 6, x:x + 6, :], crop)
        for y in range(5) for x in range(5))
    assert found


def test_augment_is_jittable():
    imgs = jnp.zeros((4, 8, 8, 1))
    f = jax.jit(lambda k, x: R.augment_batch(k, x, mirror=True, crop_size=6))
    out = f(jax.random.PRNGKey(0), imgs)
    assert out.shape == (4, 6, 6, 1)
