"""Adversarial NMS bound measurement (VERDICT r3 item 4).

The serving-latency headline (1.1 ms/frame) rides on ``nms_mask_jax``.
Round 3's full-matrix fixed point converged in chain-depth passes —
"typically < 8" — but one long alternating suppression chain (the dense-
overlap worst case) degrades it to ~N serial [N, N] passes. Round 4
replaced it with block Gauss-Seidel whose worst case is structural
(ops/boxes.py::nms_mask_jax). This tool measures, at the cascade's real
shapes (10 x 128 vmapped per-scale, 256 cross-scale, 1024 stress):

  - the blocked kernel on TYPICAL random soups vs the ADVERSARIAL chain
    (worst case must be ~typical, that's the point of the bound);
  - the round-3 full-matrix iteration on both (showing the degradation
    that motivated the fix);
  - the sequential ``nms_jax`` scan (the old floor) on both.

Timing uses the bench.py methodology: reps chained in one lax.scan with a
carry dependency, scalar fetch, min of 3.

    python tools/perf_nms_adversarial.py [--reps 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

enable_compilation_cache()

from improving_face_recognition_performance_using_triplet_loss_tpu.ops import (  # noqa: E402
    boxes as B,
)
from tools.perf_detect_breakdown import timed_scan  # noqa: E402


def full_matrix_nms(boxes, threshold, method="Union"):
    """The round-3 implementation (unbounded full-matrix fixed point),
    kept here only as the measured counter-example."""
    n = boxes.shape[0]
    s = boxes[:, 4]
    order = n - 1 - jnp.argsort(-s[::-1], stable=True)
    b = boxes[order]
    x1, y1, x2, y2, sc = (b[:, i] for i in range(5))
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = (jnp.maximum(0.0, xx2 - xx1 + 1)
             * jnp.maximum(0.0, yy2 - yy1 + 1))
    if method == "Min":
        o = inter / jnp.minimum(area[:, None], area[None, :])
    else:
        o = inter / (area[:, None] + area[None, :] - inter)
    tri = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    suppr = (o > threshold) & tri & jnp.isfinite(o)
    valid = jnp.isfinite(sc) & (sc > -jnp.inf)

    def step(k):
        return valid & ~jnp.any(suppr & k[:, None], axis=0)

    def cond(state):
        k, prev, it = state
        return jnp.any(k != prev) & (it < n)

    def body(state):
        k, _, it = state
        return step(k), k, it + 1

    k, _, it = jax.lax.while_loop(cond, body,
                                  (step(valid), valid,
                                   jnp.ones((), jnp.int32)))
    return jnp.zeros((n,), bool).at[order].set(k), it


adversarial_chain = B.adversarial_nms_chain  # single-source geometry


def typical_soup(n, seed=0):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 200, n)
    return np.stack([x1, y1, x1 + rng.uniform(5, 60, n),
                     y1 + rng.uniform(5, 60, n),
                     rng.uniform(0.5, 1.0, n)], 1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--blocks", type=int, nargs="*", default=[16, 32, 64])
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")

    for n in (128, 256, 1024):
        cases = {"typical": typical_soup(n),
                 "adversarial": adversarial_chain(n)}
        for name, bx in cases.items():
            bx_j = jnp.asarray(bx)
            # verify exactness + observed pass counts first
            ref = np.sort(B.nms(bx.astype(np.float64), 0.5, "Union"))
            mask, passes = B.nms_mask_jax(bx_j, 0.5, "Union",
                                          return_passes=True)
            assert (np.where(np.asarray(mask))[0] == ref).all(), (n, name)
            _, fm_it = full_matrix_nms(bx_j, 0.5, "Union")
            rows = []
            for blk in args.blocks:
                ms, _ = timed_scan(
                    lambda b: B.nms_mask_jax(b, 0.5, "Union", block=blk),
                    args.reps, bx_j)
                rows.append(f"blocked(B={blk}) {ms:7.3f} ms")
            ms_fm, _ = timed_scan(
                lambda b: full_matrix_nms(b, 0.5, "Union")[0],
                args.reps, bx_j)
            ms_seq, _ = timed_scan(
                lambda b: B.nms_jax(b, 0.5, "Union"), args.reps, bx_j)
            print(f"N={n:5d} {name:11s}: " + " | ".join(rows)
                  + f" | full-matrix {ms_fm:7.3f} ms ({int(fm_it)} passes)"
                  + f" | sequential {ms_seq:7.3f} ms"
                  + f" | blocked inner passes max {int(np.max(passes))}")

    # the cascade's real vmapped shape: 10 scales x 128 candidates
    for name, mk in (("typical", typical_soup),
                     ("adversarial", adversarial_chain)):
        stack = jnp.asarray(np.stack([mk(128) for _ in range(10)]))
        ms, _ = timed_scan(
            lambda s: jax.vmap(lambda c: B.nms_mask_jax(c, 0.5, "Union"))(s),
            args.reps, stack)
        print(f"vmapped 10x128 {name:11s}: blocked {ms:7.3f} ms")


if __name__ == "__main__":
    main()
