"""Distance-matrix and mining kernels vs O(n^2) numpy references
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.ops import (
    distances as D,
    mining as M,
)


def _np_pairwise_sq_l2(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def test_pairwise_sq_l2_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(13, 7)).astype(np.float32)
    b = rng.normal(size=(9, 7)).astype(np.float32)
    out = np.asarray(D.pairwise_sq_l2(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out, _np_pairwise_sq_l2(a, b), rtol=1e-4, atol=1e-4)


def test_pairwise_cosine_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(5, 11)).astype(np.float32)
    b = rng.normal(size=(6, 11)).astype(np.float32)
    out = np.asarray(D.pairwise_cosine(jnp.asarray(a), jnp.asarray(b)))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(out, an @ bn.T, rtol=1e-5, atol=1e-5)


def test_rowwise_cosine_matches_reference_loop():
    # reference cosine_dist: per-row dot/(|a||b|) (train_efm.py:26-34)
    rng = np.random.default_rng(2)
    a = rng.normal(size=(8, 16)).astype(np.float32)
    b = rng.normal(size=(8, 16)).astype(np.float32)
    out = np.asarray(D.rowwise_cosine(jnp.asarray(a), jnp.asarray(b)))
    expected = np.array(
        [a[i] @ b[i] / (np.linalg.norm(a[i]) * np.linalg.norm(b[i])) for i in range(8)]
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_l2_normalize_unit_norm():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 10)).astype(np.float32)
    n = np.asarray(D.l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-5)


def test_random_negative_labels_always_differ():
    labels = jnp.asarray(np.repeat(np.arange(8), 4))  # 32 rows, 8 ids
    idx = M.mine_random_negative(jax.random.PRNGKey(0), labels, labels)
    picked = np.asarray(labels)[np.asarray(idx)]
    assert (picked != np.asarray(labels)).all()


def test_random_negative_respects_candidate_limit():
    # train-time reference draws only from the anchor half (train_efm.py:235)
    labels = jnp.asarray(np.arange(16) % 4)
    idx = M.mine_random_negative(
        jax.random.PRNGKey(1), labels[:8], labels, num_candidates=8
    )
    assert (np.asarray(idx) < 8).all()


def test_random_negative_is_roughly_uniform():
    # gumbel-max over a mask = exact uniform over valid entries
    labels = jnp.asarray(np.array([0] * 1 + [1] * 3))  # anchor id 0, 3 negatives
    anchor = labels[:1]
    counts = np.zeros(4)
    for s in range(300):
        idx = M.mine_random_negative(jax.random.PRNGKey(s), anchor, labels)
        counts[int(idx[0])] += 1
    assert counts[0] == 0
    assert (counts[1:] > 60).all()  # ~100 each


def test_semi_hard_negative_definition():
    # anchors at 0; positive at d^2=1.0; negatives at d^2 = .5, 1.5, 9.
    sq = jnp.asarray([[0.5, 1.5, 9.0]])
    pos = jnp.asarray([1.0])
    alab = jnp.asarray([0])
    clab = jnp.asarray([1, 1, 1])
    idx = M.mine_semi_hard_negative(sq, pos, alab, clab)
    assert int(idx[0]) == 1  # closest with d > d_ap


def test_semi_hard_fallback_to_farthest():
    sq = jnp.asarray([[0.2, 0.5, 0.9]])
    pos = jnp.asarray([1.0])  # no negative beyond the positive
    idx = M.mine_semi_hard_negative(sq, pos, jnp.asarray([0]), jnp.asarray([1, 1, 1]))
    assert int(idx[0]) == 2  # farthest negative


def test_semi_hard_ignores_same_label():
    sq = jnp.asarray([[1.2, 1.1, 3.0]])
    pos = jnp.asarray([1.0])
    # index 1 is closest-beyond-positive but shares the anchor label
    idx = M.mine_semi_hard_negative(sq, pos, jnp.asarray([7]), jnp.asarray([1, 7, 1]))
    assert int(idx[0]) == 0


def test_hard_negative():
    sq = jnp.asarray([[0.9, 0.1, 2.0]])
    idx = M.mine_hard_negative(sq, jnp.asarray([0]), jnp.asarray([1, 0, 1]))
    assert int(idx[0]) == 0  # 0.1 is same-label, excluded


def test_miners_are_jittable():
    labels = jnp.asarray(np.arange(16) % 4)
    f = jax.jit(lambda k: M.mine_random_negative(k, labels, labels))
    idx = f(jax.random.PRNGKey(0))
    assert idx.shape == (16,)
