"""Property-based tests (hypothesis) for the fixed-capacity device
primitives — the code where a subtle indexing bug would silently corrupt
results rather than crash."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from improving_face_recognition_performance_using_triplet_loss_tpu.ops import (
    boxes as B,
    distances as D,
    mining as M,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas import (
    semi_hard_mining_pallas,
)

_settings = settings(max_examples=25, deadline=None)


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(1, 40),
       st.sampled_from(["Union", "Min"]),
       st.floats(0.1, 0.9))
def test_nms_jax_always_matches_oracle(seed, n, method, threshold):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, 80, n)
    y1 = rng.uniform(0, 80, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(1, 40, n),
                      y1 + rng.uniform(1, 40, n),
                      rng.uniform(0, 1, n)], 1)
    ref = B.nms(boxes, threshold, method)
    got = np.asarray(B.nms_jax(jnp.asarray(boxes), threshold, method))
    got = got[got >= 0]
    np.testing.assert_array_equal(ref, got)


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(2, 6), st.integers(2, 5))
def test_random_mining_never_picks_same_label(seed, ids, per):
    rng = np.random.default_rng(seed)
    labels = np.repeat(np.arange(ids), per)
    rng.shuffle(labels)
    idx = M.mine_random_negative(jax.random.PRNGKey(seed),
                                 jnp.asarray(labels), jnp.asarray(labels))
    assert (labels[np.asarray(idx)] != labels).all()


@_settings
@given(st.integers(0, 2**31 - 1))
def test_semi_hard_kernel_matches_oracle_random_cases(seed):
    rng = np.random.default_rng(seed)
    b = int(rng.integers(1, 5)) * 8
    n = int(rng.integers(1, 5)) * 16
    d = int(rng.integers(4, 48))
    ids = int(rng.integers(2, 8))
    anc = rng.normal(size=(b, d)).astype(np.float32)
    pool = rng.normal(size=(n, d)).astype(np.float32)
    anc /= np.linalg.norm(anc, axis=1, keepdims=True)
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)
    alab = rng.integers(0, ids, b)
    plab = rng.integers(0, ids, n)
    pos_sq = rng.uniform(0.0, 4.0, b).astype(np.float32)
    got = np.asarray(semi_hard_mining_pallas(
        jnp.asarray(anc), jnp.asarray(pos_sq), jnp.asarray(alab),
        jnp.asarray(pool), jnp.asarray(plab), tile_b=8, tile_n=16,
        interpret=True))
    sq = D.pairwise_sq_l2(jnp.asarray(anc), jnp.asarray(pool))
    ref = np.asarray(M.mine_semi_hard_negative(
        sq, jnp.asarray(pos_sq), jnp.asarray(alab), jnp.asarray(plab)))
    np.testing.assert_array_equal(got, ref)


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(1, 30))
def test_rerec_outputs_squares_containing_center(seed, n):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, 50, n)
    y1 = rng.uniform(0, 50, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(1, 30, n),
                      y1 + rng.uniform(1, 30, n), rng.uniform(0, 1, n)], 1)
    sq = B.rerec(boxes.copy())
    w = sq[:, 2] - sq[:, 0]
    h = sq[:, 3] - sq[:, 1]
    np.testing.assert_allclose(w, h, rtol=1e-6)
    # original center preserved
    np.testing.assert_allclose((sq[:, 0] + sq[:, 2]) / 2,
                               (boxes[:, 0] + boxes[:, 2]) / 2, rtol=1e-6)


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(1, 60),
       st.sampled_from(["Union", "Min"]),
       st.floats(0.1, 0.9))
def test_nms_mask_always_matches_oracle(seed, n, method, threshold):
    """The parallel fixed-point NMS (nms_mask_jax) is EXACTLY greedy NMS:
    its keep set equals the numpy oracle's on arbitrary box soups."""
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 60, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(1, 50, n),
                      y1 + rng.uniform(1, 50, n),
                      rng.uniform(0, 1, n)], 1)
    ref = np.sort(B.nms(boxes, threshold, method))
    mask = np.asarray(B.nms_mask_jax(jnp.asarray(boxes), threshold, method))
    np.testing.assert_array_equal(ref, np.where(mask)[0])


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(4, 40))
def test_nms_mask_score_ties_and_chains(seed, n):
    """Adversarial fixed-point cases: duplicated scores and long
    suppression chains (stacked overlapping boxes whose suppressor is
    itself suppressed). The ORACLE's tie order is unspecified (facenet
    uses non-stable np.argsort, detect_face.py:664), so on ties the
    contract is that BOTH jax variants agree with each other under the
    documented deterministic highest-index tiebreak; tie-free equivalence
    with the oracle is covered by the tests above."""
    rng = np.random.default_rng(seed)
    # chain: boxes shifted by a fraction of width, descending-ish scores
    # with deliberate ties
    x = np.arange(n) * 6.0
    boxes = np.stack([x, np.zeros(n), x + 20.0, np.full(n, 20.0),
                      np.round(rng.uniform(0, 1, n), 1)], 1)  # 1-dp ties
    for th in (0.2, 0.5):
        mask = np.asarray(B.nms_mask_jax(jnp.asarray(boxes), th, "Union"))
        seq = np.asarray(B.nms_jax(jnp.asarray(boxes), th, "Union"))
        np.testing.assert_array_equal(np.where(mask)[0],
                                      np.sort(seq[seq >= 0]))
        # and the keep set is a valid greedy solution: no two kept boxes
        # overlap above threshold; every dropped valid box overlaps a kept
        # higher-or-equal-scoring one
        kept = np.where(mask)[0]
        ar = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
        def iou(i, j):
            w = max(0.0, min(boxes[i, 2], boxes[j, 2])
                    - max(boxes[i, 0], boxes[j, 0]) + 1)
            h = max(0.0, min(boxes[i, 3], boxes[j, 3])
                    - max(boxes[i, 1], boxes[j, 1]) + 1)
            return w * h / (ar[i] + ar[j] - w * h)
        for a in kept:
            for b in kept:
                if a < b:
                    assert iou(a, b) <= th
        for d in set(range(n)) - set(kept):
            assert any(iou(d, k) > th and boxes[k, 4] >= boxes[d, 4]
                       for k in kept)


def test_nms_mask_invalid_rows_and_batch():
    """-inf rows never keep nor suppress; vmap over stacked sets matches
    per-set calls (the per-scale batch structure in device_pnet)."""
    rng = np.random.default_rng(0)
    sets = []
    for s in range(4):
        x1 = rng.uniform(0, 50, 16)
        y1 = rng.uniform(0, 50, 16)
        b = np.stack([x1, y1, x1 + rng.uniform(5, 30, 16),
                      y1 + rng.uniform(5, 30, 16),
                      rng.uniform(0, 1, 16)], 1).astype(np.float32)
        b[rng.integers(0, 16, 4), 4] = -np.inf
        sets.append(b)
    stacked = jnp.asarray(np.stack(sets))
    batched = np.asarray(jax.vmap(
        lambda c: B.nms_mask_jax(c, 0.4, "Union"))(stacked))
    for i, b in enumerate(sets):
        single = np.asarray(B.nms_mask_jax(jnp.asarray(b), 0.4, "Union"))
        np.testing.assert_array_equal(batched[i], single)
        assert not single[np.isinf(b[:, 4])].any()


# single source of the worst-case geometry (shared with the perf tool)
adversarial_nms_chain = B.adversarial_nms_chain


def test_nms_mask_adversarial_chain_exact_and_bounded():
    """On the adversarial chain: (1) the blocked kernel still equals the
    oracle and the sequential scan; (2) its inner pass counts are hard-
    bounded by the block size — the worst case is structural, not
    geometric (no convergence-dependent blowup)."""
    for n in (7, 64, 257):
        boxes = adversarial_nms_chain(n)
        ref = np.sort(B.nms(boxes, 0.5, "Union"))
        np.testing.assert_array_equal(ref, np.arange(0, n, 2))  # sanity
        for block in (8, 32, 300):
            mask, passes = B.nms_mask_jax(jnp.asarray(boxes), 0.5, "Union",
                                          block=block, return_passes=True)
            np.testing.assert_array_equal(ref, np.where(np.asarray(mask))[0])
            bsz = max(1, min(block, n))
            assert np.asarray(passes).max() <= bsz
        seq = np.asarray(B.nms_jax(jnp.asarray(boxes), 0.5, "Union"))
        np.testing.assert_array_equal(ref, np.sort(seq[seq >= 0]))


def test_nms_mask_block_sizes_agree():
    """Block size is a pure performance knob: every B yields the same
    keep set on random soups (incl. B > N and B = 1)."""
    rng = np.random.default_rng(7)
    n = 53
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 60, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(1, 50, n),
                      y1 + rng.uniform(1, 50, n), rng.uniform(0, 1, n)], 1)
    expect = None
    for method in ("Union", "Min"):
        for block in (1, 8, 32, 64, 200):
            mask = np.asarray(B.nms_mask_jax(jnp.asarray(boxes), 0.4,
                                             method, block=block))
            if expect is None or method_prev != method:
                expect = mask
            np.testing.assert_array_equal(expect, mask)
            method_prev = method
