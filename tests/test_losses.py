"""Triplet/CE/center loss vs hand-computed values and the facenet oracle
semantics (facenet.py:44-62; SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.losses import (
    center_loss,
    joint_id_triplet_loss,
    softmax_cross_entropy,
    triplet_loss,
)


def _np_facenet_triplet(a, p, n, alpha):
    pos = ((a - p) ** 2).sum(1)
    neg = ((a - n) ** 2).sum(1)
    return np.maximum(pos - neg + alpha, 0.0).mean()


def test_triplet_matches_facenet_oracle():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 8)).astype(np.float32)
    p = rng.normal(size=(6, 8)).astype(np.float32)
    n = rng.normal(size=(6, 8)).astype(np.float32)
    got = float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                             margin=0.2))
    np.testing.assert_allclose(got, _np_facenet_triplet(a, p, n, 0.2), rtol=1e-5)


def test_triplet_hand_computed():
    a = jnp.asarray([[0.0, 0.0]])
    p = jnp.asarray([[1.0, 0.0]])   # d_ap^2 = 1
    n = jnp.asarray([[0.0, 2.0]])   # d_an^2 = 4
    # max(1 - 4 + 0.5, 0) = 0
    assert float(triplet_loss(a, p, n, margin=0.5)) == 0.0
    # max(1 - 4 + 3.5, 0) = 0.5
    np.testing.assert_allclose(float(triplet_loss(a, p, n, margin=3.5)), 0.5)


def test_triplet_normalize_flag():
    a = jnp.asarray([[10.0, 0.0]])
    p = jnp.asarray([[1.0, 0.0]])
    n = jnp.asarray([[0.0, 5.0]])
    # normalized: a==p, so d_ap=0, d_an^2=2 -> max(0-2+0.2,0)=0
    assert float(triplet_loss(a, p, n, margin=0.2, normalize=True)) == 0.0


def test_softmax_ce_matches_numpy():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(5, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=(5,))
    got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    z = logits - logits.max(1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(1, keepdims=True))
    expected = -logp[np.arange(5), labels].mean()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_joint_loss_composition():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 0])
    a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    total, id_l, tl = joint_id_triplet_loss(logits, labels, a, p, n,
                                            margin=0.2, alpha=0.1)
    np.testing.assert_allclose(float(total), float(id_l) + 0.1 * float(tl),
                               rtol=1e-6)


def test_center_loss_semantics():
    # reference facenet.py:64-77: centers -= (1-alfa)*(centers_batch - feat)
    feats = jnp.asarray([[1.0, 1.0], [3.0, 3.0]])
    labels = jnp.asarray([0, 0])
    centers = jnp.zeros((2, 2))
    loss, new_centers = center_loss(feats, labels, centers, alfa=0.5)
    np.testing.assert_allclose(float(loss), (2 * 1.0 + 2 * 9.0) / 4)
    # both updates hit class 0: -0.5*(0-1) - 0.5*(0-3) = +2.0 per dim
    np.testing.assert_allclose(np.asarray(new_centers)[0], [2.0, 2.0])
    np.testing.assert_allclose(np.asarray(new_centers)[1], [0.0, 0.0])
