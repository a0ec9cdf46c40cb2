"""Native ERT refinement latency at the dlib shape_predictor_68 scale —
the reproducible source of BASELINE.md's 0.46 ms/face row (random weights;
tree-traversal cost is weight-independent).

    python tools/perf_native_ert.py [--cascades 10] [--trees 500]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=68)
    ap.add_argument("--cascades", type=int, default=10)
    ap.add_argument("--trees", type=int, default=500)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--feature-pool", type=int, default=500)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.ert import (
        CascadeLevel,
        ShapePredictor,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_ert,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.native import (
        NativeErt,
    )

    rng = np.random.default_rng(0)
    L, T, K, D, P = (args.points, args.cascades, args.trees, args.depth,
                     args.feature_pool)
    levels = [CascadeLevel(
        anchors=rng.integers(0, L, P),
        deltas=rng.normal(0, 0.1, (P, 2)).astype(np.float32),
        split_idx1=rng.integers(0, P, (K, 2 ** D - 1)),
        split_idx2=rng.integers(0, P, (K, 2 ** D - 1)),
        split_thresh=rng.normal(0, 10, (K, 2 ** D - 1)).astype(np.float32),
        leaf_values=rng.normal(0, 1e-4, (K, 2 ** D, 2 * L)).astype(
            np.float32),
    ) for _ in range(T)]
    pred = ShapePredictor(
        mean_shape=rng.uniform(0, 1, (L, 2)).astype(np.float32),
        levels=levels)
    tmpdir = tempfile.TemporaryDirectory()
    npz = export_ert(os.path.join(tmpdir.name, "ert.npz"), pred)
    print(f"model: T={T} K={K} D={D} P={P}, "
          f"{os.path.getsize(npz) / 1e6:.1f} MB", file=sys.stderr)

    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    rect = np.asarray([100, 100, 300, 300], np.float32)
    with NativeErt(npz) as ert:
        ert.predict(img, rect)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ert.predict(img, rect)
            ts.append(time.perf_counter() - t0)
    py_ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        pred.predict(img, rect)
        py_ts.append(time.perf_counter() - t0)
    py_ms = min(py_ts) * 1e3  # min vs min: like statistics on both sides
    print(f"native ERT predict: {min(ts) * 1e3:.2f} ms/face "
          f"(numpy inference: {py_ms:.2f} ms, "
          f"{py_ms / (min(ts) * 1e3):.0f}x)")
    tmpdir.cleanup()


if __name__ == "__main__":
    main()
