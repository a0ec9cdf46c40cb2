"""Native MTCNN cascade latency on the host CPU — completes the native
serving perf table (the embedder rows are in BASELINE.md; this measures the
detection half of the reference's in-process loop, MTCNN.hpp:993).

Weights are random-init (no det*.npy exists in this environment); cascade
cost is weight-independent for a fixed box count, so the numbers are the
real pyramid/stage costs. Two operating points:
  - quiet frame: default thresholds, zero candidates past stage 1
    (the pyramid PNet sweep floor)
  - busy frame: thresholds lowered until stage 2/3 process real box counts

    python tools/perf_native_detect.py [--height 480] [--width 640]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--minsize", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--int8", action="store_true",
                    help="quantized convs (~10%% on busy frames only: "
                         "PNet's 10/16/32-channel convs are im2col-bound, "
                         "unlike the embedder's 2.9x)")
    ap.add_argument("--threads", type=int, nargs="*",
                    help="OMP team sizes to sweep (e.g. 1 2 4 8); default: "
                         "the hardware default only")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        mtcnn as nets,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_mtcnn,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.native import (
        NativeMtcnn,
        native_set_num_threads,
    )

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    npz = "/tmp/perf_mtcnn.npz"
    export_mtcnn(npz, nets.init_pnet_params(k1), nets.init_rnet_params(k2),
                 nets.init_onet_params(k3))
    det = NativeMtcnn(npz, quantized=args.int8)

    rng = np.random.default_rng(0)
    h, w = args.height, args.width
    noise = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    cell = max(h // 60, 1)
    smooth = np.kron(rng.uniform(40, 210, (h // cell, w // cell, 3)),
                     np.ones((cell, cell, 1)))[:h, :w].astype(np.float32)

    # Random-weight PNet saturates at the real-weight threshold 0.6 (89% of
    # cells pass on noise -> the O(n^2) NMS dominates, which no real frame
    # produces). th1=0.9 passes zero cells -> the honest pyramid-sweep
    # floor; the busy point is tuned to a realistic candidate load.
    thread_points = args.threads or [0]  # 0 = hardware default
    for nthr in thread_points:
        eff = native_set_num_threads(nthr)
        for label, img, th in (
                ("quiet", noise, (0.9, 0.7, 0.7)),
                ("busy", smooth, (0.7, 0.35, 0.3))):
            boxes, _ = det.detect(img, minsize=args.minsize, thresholds=th)
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                det.detect(img, minsize=args.minsize, thresholds=th)
                ts.append(time.perf_counter() - t0)
            print(f"threads={eff} {label} {h}x{w} minsize={args.minsize} "
                  f"th={th}: {min(ts) * 1e3:.1f} ms/frame "
                  f"({boxes.shape[0]} faces)")


if __name__ == "__main__":
    main()
