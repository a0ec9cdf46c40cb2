"""Packed image stores + device-side augmentation.

Replaces the reference's RecordIO path (``mx.io.ImageRecordIter`` with
``scale=1/255, rand_crop, rand_mirror``, 14 preprocess threads,
train_efm.py:179): images are packed once into a uint8 .npz store (or memory-
mapped .npy pair for large sets), and the per-batch augmentation runs ON
DEVICE inside jit (mirror + crop + scale fused into the forward program) —
the 14 host threads existed to feed a host-side augment loop that does not
exist here.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def save_image_store(path: str, images: np.ndarray, labels: np.ndarray) -> None:
    """images: [N, H, W, C] uint8 or float in [0,1]; labels: [N] ints."""
    images = np.asarray(images)
    if images.dtype != np.uint8:
        images = np.clip(images * 255.0, 0, 255).astype(np.uint8)
    np.savez_compressed(path, images=images,
                        labels=np.asarray(labels, np.int64))


def load_image_store(path: str) -> tuple[np.ndarray, np.ndarray]:
    with np.load(path) as z:
        return z["images"], z["labels"]


def save_image_store_mmap(dirpath: str, images: np.ndarray,
                          labels: np.ndarray) -> None:
    """Memory-mappable variant for Celeb1M-scale sets (no decompression)."""
    os.makedirs(dirpath, exist_ok=True)
    images = np.asarray(images)
    if images.dtype != np.uint8:
        images = np.clip(images * 255.0, 0, 255).astype(np.uint8)
    np.save(os.path.join(dirpath, "images.npy"), images)
    np.save(os.path.join(dirpath, "labels.npy"),
            np.asarray(labels, np.int64))


def load_image_store_mmap(dirpath: str):
    images = np.load(os.path.join(dirpath, "images.npy"), mmap_mode="r")
    labels = np.load(os.path.join(dirpath, "labels.npy"))
    return images, labels


_NPY_MAGIC = b"\x93NUMPY\x01\x00"
_NPY_HEADER_TOTAL = 128  # magic(6) + version(2) + hlen(2) + padded dict


def _npy_header_bytes(count: int, item_shape: tuple[int, ...]) -> bytes:
    """Fixed-width (patchable in place) v1 .npy header for a uint8 array of
    shape ``(count, *item_shape)``. Always ``_NPY_HEADER_TOTAL`` bytes, so the
    count can be rewritten after streaming appends without moving data."""
    shape = (count,) + tuple(int(s) for s in item_shape)
    d = ("{'descr': '|u1', 'fortran_order': False, "
         f"'shape': {shape!r}, }}")
    pad = _NPY_HEADER_TOTAL - len(_NPY_MAGIC) - 2 - 1 - len(d)
    if pad < 0:
        raise ValueError(f"header overflow for shape {shape}")
    header = d + " " * pad + "\n"
    import struct

    return _NPY_MAGIC + struct.pack("<H", len(header)) + header.encode()


class ImageStoreWriter:
    """Streaming writer for the mmap image-store layout (images.npy +
    labels.npy) with O(batch) RAM.

    The reference streams Celeb1M through RecordIO files built by im2rec
    (train_efm.py:135-136, 179); this is the packed-store equivalent: images
    append straight to ``images.npy`` behind a placeholder header that is
    patched with the final count on :meth:`close`, so the result is readable
    by ``np.load(mmap_mode='r')`` / :func:`load_image_store_mmap`. At 4.6M
    images nothing but the current batch is ever resident.

    Use as a context manager, or call ``close()`` explicitly.
    """

    def __init__(self, dirpath: str, image_shape: tuple[int, int, int]):
        os.makedirs(dirpath, exist_ok=True)
        self.dirpath = dirpath
        self.image_shape = tuple(int(s) for s in image_shape)
        self._path = os.path.join(dirpath, "images.npy")
        self._f = open(self._path, "wb")
        self._f.write(_npy_header_bytes(0, self.image_shape))
        self._labels: list[np.ndarray] = []
        self.count = 0
        self._closed = False

    def append(self, images: np.ndarray, labels: np.ndarray) -> None:
        images = np.ascontiguousarray(images)
        if images.dtype != np.uint8:
            images = np.clip(images * 255.0, 0, 255).astype(np.uint8)
        if images.ndim == len(self.image_shape):  # single image
            images = images[None]
        if tuple(images.shape[1:]) != self.image_shape:
            raise ValueError(
                f"image shape {images.shape[1:]} != store {self.image_shape}")
        labels = np.atleast_1d(np.asarray(labels, np.int64))
        if labels.shape[0] != images.shape[0]:
            raise ValueError("images/labels length mismatch")
        self._f.write(images.tobytes())
        self._labels.append(labels)
        self.count += images.shape[0]

    def close(self) -> None:
        if self._closed:
            return
        self._f.flush()
        self._f.seek(0)
        self._f.write(_npy_header_bytes(self.count, self.image_shape))
        self._f.close()
        labels = (np.concatenate(self._labels) if self._labels
                  else np.zeros((0,), np.int64))
        np.save(os.path.join(self.dirpath, "labels.npy"), labels)
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def normalize_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (ImageRecordIter scale=1/255)."""
    return images.astype(jnp.float32) / 255.0


def prewhiten(images: jnp.ndarray) -> jnp.ndarray:
    """Per-image standardization (facenet.py prewhiten semantics): subtract
    the image mean, divide by max(std, 1/sqrt(size)). [B, H, W, C] or
    [H, W, C]."""
    axes = tuple(range(images.ndim - 3, images.ndim))
    x = images.astype(jnp.float32)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.std(x, axis=axes, keepdims=True)
    size = float(np.prod(x.shape[-3:]))
    std_adj = jnp.maximum(std, 1.0 / np.sqrt(size))
    return (x - mean) / std_adj


def fixed_standardization(images: jnp.ndarray) -> jnp.ndarray:
    """facenet's FIXED_STANDARDIZATION bit: (x*255 - 127.5) / 128 for
    [0, 1]-scaled inputs (uint8 inputs divide by 255 first)."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    return (x * 255.0 - 127.5) / 128.0


def rotate_batch(key: jax.Array, images: jnp.ndarray,
                 max_degrees: float = 10.0) -> jnp.ndarray:
    """Per-row random rotation about the image center (facenet's
    RANDOM_ROTATE bit) — bilinear resampling via map_coordinates inside
    jit, zero-filled outside the frame."""
    from jax.scipy.ndimage import map_coordinates

    b, h, w, c = images.shape
    angles = jax.random.uniform(key, (b,), minval=-max_degrees,
                                maxval=max_degrees) * (jnp.pi / 180.0)
    yy, xx = jnp.mgrid[0:h, 0:w]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def rot_one(img, a):
        cos, sin = jnp.cos(a), jnp.sin(a)
        src_y = cy + (yy - cy) * cos - (xx - cx) * sin
        src_x = cx + (yy - cy) * sin + (xx - cx) * cos
        coords = jnp.stack([src_y, src_x])

        def chan(ch):
            return map_coordinates(ch, coords, order=1, mode="constant",
                                   cval=0.0)

        return jnp.stack([chan(img[..., k]) for k in range(c)], axis=-1)

    return jax.vmap(rot_one)(images.astype(jnp.float32), angles)


def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,
    *,
    mirror: bool = True,
    crop_size: int | None = None,
) -> jnp.ndarray:
    """Device-side augmentation: per-image random horizontal mirror and
    (optional) random crop to ``crop_size`` (rand_mirror/rand_crop flags).

    jit-compatible: the crop uses a single dynamic_slice per batch row via
    vmap; shapes stay static.
    """
    b = images.shape[0]
    k_mirror, k_crop = jax.random.split(key)
    if mirror:
        flip = jax.random.bernoulli(k_mirror, 0.5, (b,))
        images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :],
                           images)
    if crop_size is not None and crop_size < images.shape[1]:
        h, w = images.shape[1], images.shape[2]
        max_y, max_x = h - crop_size, w - crop_size
        ys = jax.random.randint(k_crop, (b,), 0, max_y + 1)
        xs = jax.random.randint(jax.random.fold_in(k_crop, 1), (b,), 0,
                                max_x + 1)

        def crop_one(img, y, x):
            return jax.lax.dynamic_slice(
                img, (y, x, 0), (crop_size, crop_size, img.shape[-1]))

        images = jax.vmap(crop_one)(images, ys, xs)
    return images
