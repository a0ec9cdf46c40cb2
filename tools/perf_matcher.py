"""Native AVX gallery-matcher throughput (serving-side hot loop,
reference C18's SSE scan, Feature.hpp:273-392)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
    native as N,
)


def main():
    N.build_native()
    lib = N.load_native()
    import ctypes

    d = 342
    rng = np.random.default_rng(0)
    for n in (10_000, 100_000, 1_000_000):
        gallery = rng.normal(size=(n, d)).astype(np.float32)
        g, gp = N._f32(gallery)
        norms = np.empty(n, np.float32)
        lib.fx_gallery_norms(gp, n, d, norms.ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)))
        np_ = norms.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        q, qp = N._f32(gallery[n // 2])
        sim = ctypes.c_float(0)
        # warm
        lib.fx_match_gallery(gp, np_, n, d, qp, 0.0, ctypes.byref(sim))
        iters = max(2_000_000 // n, 3)
        t0 = time.perf_counter()
        for _ in range(iters):
            idx = lib.fx_match_gallery(gp, np_, n, d, qp, 0.0,
                                       ctypes.byref(sim))
        dt = (time.perf_counter() - t0) / iters
        assert idx == n // 2
        rows_per_s = n / dt
        gb_per_s = rows_per_s * d * 4 / 1e9
        print(f"gallery {n:>9,d} x {d}: {dt*1e3:7.2f} ms/query "
              f"({rows_per_s/1e6:6.1f} M rows/s, {gb_per_s:5.1f} GB/s)")


if __name__ == "__main__":
    main()
