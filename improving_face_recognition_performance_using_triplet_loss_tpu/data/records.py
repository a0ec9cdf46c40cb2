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


def normalize_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (ImageRecordIter scale=1/255)."""
    return images.astype(jnp.float32) / 255.0


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
