"""Serving latency vs gallery size with the gallery as a RUNTIME argument
(`dynamic_gallery=True`, serve/pipeline.py::make_recognition_pipeline).

The production identity DB grows at runtime (`Register_PDB`,
feature_extraction/c_version/Feature.hpp:189-205 matches against an
in-memory table reloaded from the DB) — so the serving graph must NOT bake
the gallery as a compile-time constant. Round-3 measurement: a 1M x 342 f32
gallery baked as a constant stalls XLA constant serialization at compile
time; as a runtime arg the same gallery is one 1.37 GB device array and the
pipeline compiles once per gallery SHAPE.

This tool measures, on the real chip:
  - ms/frame for the fused single-face pipeline at gallery sizes
    10k -> 1M (runtime-arg gallery, bench.py scan methodology),
  - enrollment-without-retrace: update gallery rows at a FIXED shape and
    confirm the second call pays no compile,
  - the matmul roofline share: the [1,342]x[342,G] match is bandwidth-bound
    (2*G*342 FLOPs vs 4*G*342 bytes), so ms/frame should grow ~linearly
    with G at HBM speed once G is large.

    python tools/perf_gallery_scale.py [--size 250] [--frames 32] \
        [--galleries 10000 100000 1000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=250)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--galleries", type=int, nargs="*",
                    default=[10_000, 100_000, 1_000_000])
    ap.add_argument("--streams", type=int, default=0,
                    help="also measure the multistream dynamic pipeline at "
                         "N streams/dispatch: the [N, D] x [D, G] match "
                         "streams the gallery ONCE per dispatch, so the "
                         "per-frame gallery HBM cost divides by N")
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli._common import (
        GALLERY_DTYPE_NAMES,
        gallery_dtype,
    )

    ap.add_argument("--dtype", choices=GALLERY_DTYPE_NAMES,
                    default="f32",
                    help="gallery storage dtype: bf16 halves / int8 "
                         "quarters the bandwidth-bound match stage's HBM "
                         "traffic (the +ms-vs-smallest-G term scales with "
                         "the bytes)")
    args = ap.parse_args()

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
        make_multistream_pipeline,
        make_recognition_pipeline,
        normalize_gallery,
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
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(
        0, 255, (args.frames, args.size, args.size, 3)), jnp.float32)

    pipe = make_recognition_pipeline(
        det, model, variables, None, frame_h=args.size, frame_w=args.size,
        embed_size=64, thresholds=(0.3, 0.3, 0.3), dynamic_gallery=True)

    @jax.jit
    def scanned(fs, gal_n):
        def body(acc, frame):
            out = pipe(frame, gal_n)
            return acc + jnp.sum(jnp.where(
                jnp.isfinite(out["similarity"]), out["similarity"], 0.0)), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), fs)
        return acc

    base_ms = None
    for g in args.galleries:
        # build the gallery on HOST, normalize on device in chunks via
        # normalize_gallery (one [G, 342] transfer)
        gal = rng.normal(size=(g, 342)).astype(np.float32)
        gdtype = gallery_dtype(args.dtype)
        t0 = time.perf_counter()
        gal_n = jax.block_until_ready(normalize_gallery(gal, gdtype))
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(scanned(frames, gal_n))
        print(f"G={g:>9,}: compile+first {time.perf_counter() - t0:.1f}s "
              f"(gallery upload {up:.2f}s, "
              f"{gal.nbytes / 1e9:.2f} GB)", file=sys.stderr)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(scanned(frames, gal_n))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / args.frames * 1e3
        if base_ms is None:
            base_ms = per
        # incremental HBM cost of the match stage at this G vs smallest G
        print(f"G={g:>9,}: {per:.2f} ms/frame "
              f"(+{per - base_ms:.2f} ms vs G={args.galleries[0]:,})")

        # enrollment without retrace: overwrite one row at the SAME shape —
        # must not recompile (compile would show up as seconds, not ms)
        gal2 = np.array(gal)
        gal2[0] = rng.normal(size=342)
        gal2_n = jax.block_until_ready(normalize_gallery(gal2, gdtype))
        t0 = time.perf_counter()
        _ = float(scanned(frames, gal2_n))
        dt = time.perf_counter() - t0
        retraced = dt > 5 * max(ts)
        print(f"G={g:>9,}: enroll-at-fixed-shape call "
              f"{dt / args.frames * 1e3:.2f} ms/frame "
              f"({'RETRACED — BUG' if retraced else 'no retrace'})")

        # O(row) enrollment: DeviceGallery.add vs the full re-upload above.
        # 100 adds queued then forced with a scalar fetch (tunnel timing
        # honesty — block_until_ready lies, see verify notes)
        from improving_face_recognition_performance_using_triplet_loss_tpu.serve.device_gallery import (
            DeviceGallery,
        )

        dg = DeviceGallery(dim=342, capacity=g, dtype=gdtype)
        dg.add(rng.normal(size=342).astype(np.float32))  # warm the jits
        _ = float(jnp.sum(dg.gallery_n[0]))
        n_adds = 100
        t0 = time.perf_counter()
        for _i in range(n_adds):
            dg.add(rng.normal(size=342).astype(np.float32))
        _ = float(jnp.sum(dg.gallery_n[0]))
        per_add = (time.perf_counter() - t0) / n_adds
        print(f"G={g:>9,}: DeviceGallery.add {per_add * 1e3:.2f} ms/enroll "
              f"(vs {up:.2f}s full re-upload)")
        del dg

        if args.streams:
            n = args.streams
            multi = make_multistream_pipeline(
                det, model, variables, None, frame_h=args.size,
                frame_w=args.size, embed_size=64,
                thresholds=(0.3, 0.3, 0.3), dynamic_gallery=True)
            batch = jnp.asarray(rng.uniform(
                0, 255, (n, args.size, args.size, 3)), jnp.float32)

            @jax.jit
            def scanned_multi(b, gn):
                def body(acc, _):
                    out = multi(b + acc * 1e-24, gn)
                    return acc + jnp.sum(jnp.where(
                        jnp.isfinite(out["similarity"]),
                        out["similarity"], 0.0)), None

                acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                      length=args.frames)
                return acc

            t0 = time.perf_counter()
            _ = float(scanned_multi(batch, gal_n))
            print(f"G={g:>9,} N={n}: compile+first "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            ts = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = float(scanned_multi(batch, gal_n))
                ts.append(time.perf_counter() - t0)
            per_batch = min(ts) / args.frames
            print(f"G={g:>9,} N={n} streams: "
                  f"{per_batch / n * 1e3:.2f} ms/frame, "
                  f"{n / per_batch:,.0f} frames/s "
                  f"(gallery streamed once per dispatch)")
        del gal, gal2, gal_n, gal2_n


if __name__ == "__main__":
    main()
