"""Fused serving-pipeline latency on the real chip, measured the honest way
(bench.py methodology: K frames chained in one lax.scan program, scalar
fetch at the end — per-dispatch timing through the tunnel pays a ~30 ms
fixed cost per call and lies under host load).

Covers both pipelines: single-face (largest-centered, serve/pipeline.py::
make_recognition_pipeline) and multi-face (top-K per frame,
make_multiface_pipeline).

    python tools/perf_pipeline.py [--size 250] [--gallery 10000] [--frames 32]

Per-STAGE cost decomposition of the detector inside this pipeline
(convs vs NMS vs crops vs RNet/ONet) lives in
tools/perf_detect_breakdown.py — the round-3 table that located the
sequential-NMS bottleneck (BASELINE.md "Round-3 detector restructure").
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=250)
    ap.add_argument("--frame-size", type=int, nargs=2, metavar=("H", "W"),
                    help="non-square frames (e.g. 480 640 = the reference's "
                         "VGA cameras); overrides --size")
    ap.add_argument("--gallery", type=int, default=10000)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--max-faces", type=int, default=8)
    ap.add_argument("--streams", type=int, nargs="*", default=[8, 32, 64],
                    help="multi-stream batch sizes for the throughput rows "
                         "(make_multistream_pipeline); [] skips them")
    args = ap.parse_args()
    fh, fw = (args.frame_size if args.frame_size
              else (args.size, args.size))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.pipeline import (
        MTCNNDetector,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        make_multiface_pipeline,
        make_recognition_pipeline,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)
    det = MTCNNDetector(seed=0)
    model = EFMNet342(num_classes=100)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32))
    gallery = np.random.default_rng(0).normal(
        size=(args.gallery, 342)).astype(np.float32)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(
        0, 255, (args.frames, fh, fw, 3)), jnp.float32)

    for name, pipe in (
            ("single-face", make_recognition_pipeline(
                det, model, variables, gallery, frame_h=fh,
                frame_w=fw, embed_size=64, thresholds=(0.3, 0.3, 0.3))),
            (f"multi-face K={args.max_faces}", make_multiface_pipeline(
                det, model, variables, gallery, frame_h=fh,
                frame_w=fw, embed_size=64, thresholds=(0.3, 0.3, 0.3),
                max_faces=args.max_faces)),
    ):
        @jax.jit
        def scanned(fs):
            def body(acc, frame):
                out = pipe(frame)
                key = ("similarity" if "similarity" in out
                       else "similarities")
                return acc + jnp.sum(jnp.where(
                    jnp.isfinite(out[key]), out[key], 0.0)), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), fs)
            return acc

        t0 = time.perf_counter()
        _ = float(scanned(frames))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(scanned(frames))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / args.frames
        print(f"{name}: {per * 1e3:.1f} ms/frame "
              f"({fh}x{fw}, {args.gallery}-row gallery)")

    # throughput mode: N same-shape camera streams per dispatch (vmapped
    # pipeline), scan-chained over args.frames steps -> frames/s/chip
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        make_multistream_pipeline,
    )

    for n in args.streams:
        multi = make_multistream_pipeline(
            det, model, variables, gallery, frame_h=fh,
            frame_w=fw, embed_size=64, thresholds=(0.3, 0.3, 0.3))
        batch = jnp.asarray(rng.uniform(
            0, 255, (n, fh, fw, 3)), jnp.float32)

        @jax.jit
        def scanned_multi(b):
            def body(acc, _):
                b_dep = b + (acc * 1e-24)
                out = multi(b_dep)
                return acc + jnp.sum(jnp.where(
                    jnp.isfinite(out["similarity"]),
                    out["similarity"], 0.0)), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                  length=args.frames)
            return acc

        t0 = time.perf_counter()
        _ = float(scanned_multi(batch))
        print(f"multistream N={n}: compile+first "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(scanned_multi(batch))
            ts.append(time.perf_counter() - t0)
        per_batch = min(ts) / args.frames
        print(f"multistream N={n}: {per_batch / n * 1e3:.2f} ms/frame, "
              f"{n / per_batch:,.0f} frames/s "
              f"({fh}x{fw}, {args.gallery}-row gallery)")


if __name__ == "__main__":
    main()
