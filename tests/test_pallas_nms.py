"""Pins the one-dispatch Pallas NMS kernel against the numpy oracle and
the block Gauss-Seidel fixed point.

``ops/pallas/nms_kernel.py`` re-expresses ``ops.boxes.nms_mask_jax`` as a
single Pallas program (the round-4 trace attributed 62% of single-frame
device time to the scan+while dispatch overhead of the XLA form). The
contract here is EXACT equality of keep sets:

- tie-free random soups must match the numpy oracle ``ops.oracles.nms``
  (reference detect_face.py:626-660 semantics) for Union and Min;
- with score ties the oracle's order is unspecified (non-stable argsort),
  so the contract is agreement with ``nms_mask_jax``'s documented
  deterministic highest-index tiebreak;
- the adversarial alternating chain (``adversarial_nms_chain``) must give
  the exact greedy keep set with inner pass counts hard-bounded by the
  block size;
- -inf (invalid/padded) rows never keep nor suppress;
- the batched [S, N, 5] form equals per-frame calls (the per-scale batch
  structure in detect/device_pnet.py).

Runs in Pallas interpret mode on the CPU test mesh; the same code path
compiles on TPU (measured in tools/perf_detect_breakdown.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import improving_face_recognition_performance_using_triplet_loss_tpu.ops.boxes as B
from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas.nms_kernel import (
    nms_mask_pallas,
    nms_mask_pallas_batched,
)


def _soup(rng, n):
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 60, n)
    return np.stack([x1, y1, x1 + rng.uniform(1, 50, n),
                     y1 + rng.uniform(1, 50, n),
                     rng.uniform(0, 1, n)], 1).astype(np.float32)


@pytest.mark.parametrize("method", ["Union", "Min"])
@pytest.mark.parametrize("n", [1, 7, 64, 128, 257])
@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7])
def test_pallas_nms_matches_oracle(method, n, threshold):
    """Tie-free random soups: keep set == numpy oracle, both methods."""
    rng = np.random.default_rng(n * 1000 + int(threshold * 10))
    boxes = _soup(rng, n)
    ref = np.sort(B.nms(boxes, threshold, method))
    mask = np.asarray(nms_mask_pallas(jnp.asarray(boxes), threshold, method))
    np.testing.assert_array_equal(ref, np.where(mask)[0])


@pytest.mark.parametrize("seed", range(6))
def test_pallas_nms_score_ties_match_fixed_point(seed):
    """With deliberate ties (1-dp scores) the oracle order is unspecified;
    the Pallas kernel must reproduce nms_mask_jax's highest-index
    tiebreak exactly."""
    rng = np.random.default_rng(seed)
    n = 48
    x = np.arange(n) * 6.0
    boxes = np.stack([x, np.zeros(n), x + 20.0, np.full(n, 20.0),
                      np.round(rng.uniform(0, 1, n), 1)], 1).astype(
                          np.float32)
    for th in (0.2, 0.5):
        want = np.asarray(B.nms_mask_jax(jnp.asarray(boxes), th, "Union"))
        got = np.asarray(nms_mask_pallas(jnp.asarray(boxes), th, "Union"))
        np.testing.assert_array_equal(want, got)


def test_pallas_nms_adversarial_chain_exact_and_bounded():
    """The dense-overlap worst case (one maximal alternating suppression
    chain): exact greedy keep set (= every even position) and inner pass
    counts bounded by the lane-aligned block size."""
    for n in (7, 64, 257):
        boxes = B.adversarial_nms_chain(n)
        ref = np.arange(0, n, 2)
        for block in (128, 256):
            mask, passes = nms_mask_pallas(jnp.asarray(boxes), 0.5, "Union",
                                           block=block, return_passes=True)
            np.testing.assert_array_equal(ref, np.where(np.asarray(mask))[0])
            assert np.asarray(passes).max() <= max(128, block)


def test_pallas_nms_invalid_rows_never_keep_nor_suppress():
    """-inf rows are ignored entirely: the keep set on [valid | -inf mix]
    equals the keep set of the valid subset alone."""
    rng = np.random.default_rng(3)
    boxes = _soup(rng, 40)
    kill = rng.choice(40, 12, replace=False)
    boxes[kill, 4] = -np.inf
    mask = np.asarray(nms_mask_pallas(jnp.asarray(boxes), 0.4, "Union"))
    assert not mask[kill].any()
    alive = np.setdiff1d(np.arange(40), kill)
    sub = boxes[alive]
    sub_mask = np.asarray(nms_mask_pallas(jnp.asarray(sub), 0.4, "Union"))
    np.testing.assert_array_equal(mask[alive], sub_mask)


def test_pallas_nms_batched_matches_single():
    """[S, N, 5] batched grid form == per-frame single calls, including
    frames that are entirely -inf (empty scales in the pyramid stack)."""
    rng = np.random.default_rng(11)
    sets = []
    for s in range(5):
        b = _soup(rng, 96)
        b[rng.choice(96, 20, replace=False), 4] = -np.inf
        sets.append(b)
    sets.append(np.zeros((96, 5), np.float32))  # all-invalid frame
    sets[-1][:, 4] = -np.inf
    stacked = jnp.asarray(np.stack(sets))
    batched = np.asarray(nms_mask_pallas_batched(stacked, 0.5, "Union"))
    for i, b in enumerate(sets):
        single = np.asarray(nms_mask_pallas(jnp.asarray(b), 0.5, "Union"))
        np.testing.assert_array_equal(batched[i], single)
    assert not batched[-1].any()


def test_pallas_nms_block_sizes_agree():
    """Block size is a pure performance knob (rounded up to 128 lanes):
    every block gives the same keep set."""
    rng = np.random.default_rng(7)
    boxes = _soup(rng, 300)
    for method in ("Union", "Min"):
        expect = None
        for block in (1, 128, 256, 512):
            mask = np.asarray(nms_mask_pallas(jnp.asarray(boxes), 0.4,
                                              method, block=block))
            if expect is None:
                expect = mask
            np.testing.assert_array_equal(expect, mask)


def test_pallas_nms_min_method_oracle_large():
    """Min mode (stage-3 semantics, MTCNN.hpp NMS-Min 0.4 analogue) on a
    larger-than-one-block soup."""
    rng = np.random.default_rng(42)
    boxes = _soup(rng, 260)
    ref = np.sort(B.nms(boxes, 0.4, "Min"))
    mask = np.asarray(nms_mask_pallas(jnp.asarray(boxes), 0.4, "Min"))
    np.testing.assert_array_equal(ref, np.where(mask)[0])


def test_pallas_nms_matches_fixed_point_on_pyramid_shapes():
    """The exact call shapes the device cascade issues — per-scale
    [S, 128, 5] at 0.5/Union, cross-scale [S*128, 5] at 0.7/Union,
    stage-2 [128, 5] 0.7/Union, stage-3 [64, 5] 0.7/Min — agree with
    nms_mask_jax (the currently-wired XLA form) bit-for-bit."""
    rng = np.random.default_rng(5)
    stacked = np.stack([_soup(rng, 128) for _ in range(6)])
    for s in stacked:
        s[rng.choice(128, 30, replace=False), 4] = -np.inf
    got = np.asarray(nms_mask_pallas_batched(jnp.asarray(stacked), 0.5,
                                             "Union"))
    want = np.asarray(jax.vmap(
        lambda c: B.nms_mask_jax(c, 0.5, "Union"))(jnp.asarray(stacked)))
    np.testing.assert_array_equal(want, got)

    allc = stacked.reshape(-1, 5)
    np.testing.assert_array_equal(
        np.asarray(B.nms_mask_jax(jnp.asarray(allc), 0.7, "Union")),
        np.asarray(nms_mask_pallas(jnp.asarray(allc), 0.7, "Union")))

    b64 = _soup(rng, 64)
    np.testing.assert_array_equal(
        np.asarray(B.nms_mask_jax(jnp.asarray(b64), 0.7, "Min")),
        np.asarray(nms_mask_pallas(jnp.asarray(b64), 0.7, "Min")))


def test_pallas_nms_inside_jit():
    """The kernel composes under an outer jit (how the fused cascade
    calls it)."""
    rng = np.random.default_rng(9)
    boxes = jnp.asarray(_soup(rng, 128))

    @jax.jit
    def f(b):
        return nms_mask_pallas(b, 0.5, "Union")

    np.testing.assert_array_equal(
        np.asarray(f(boxes)),
        np.asarray(B.nms_mask_jax(boxes, 0.5, "Union")))


def test_device_cascade_pallas_nms_equals_xla_path():
    """The WIRED path: make_device_cascade(use_pallas_nms=True) — running
    the Pallas kernel in interpret mode on CPU — produces the same boxes,
    points, and counts as the default XLA fixed point. This pins the flag
    threading through detect/device_pnet.py and detect/device_cascade.py
    (the path serve/pipeline.py builds on)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect import (
        MTCNNDetector,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.device_cascade import (
        make_device_cascade,
    )

    det = MTCNNDetector(seed=0)
    rng = np.random.default_rng(1)
    img = jnp.asarray((rng.random((64, 64, 3)) * 255).astype(np.float32))
    kw = dict(thresholds=(0.1, 0.1, 0.1), stage1_cap=64, stage2_cap=32,
              out_cap=16, k_per_scale=32)
    ref = make_device_cascade(det.pnet_params, det.rnet_params,
                              det.onet_params, 64, 64,
                              use_pallas_nms=False, **kw)(img)
    got = make_device_cascade(det.pnet_params, det.rnet_params,
                              det.onet_params, 64, 64,
                              use_pallas_nms=True, **kw)(img)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=0, atol=0)
