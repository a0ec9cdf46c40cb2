"""Int8 extraction throughput vs the bf16 bench path, on the real chip.

Same methodology as bench.py (one lax.scan program, scalar fetch, B=128)
so the numbers are directly comparable; also reports embedding cosine
int8-vs-f32 so the accuracy cost rides along.

    python tools/perf_int8_extract.py [--batch 128] [--batches 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=int, default=256)
    args = ap.parse_args()

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.distances import (
        l2_normalize,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.quantized import (
        make_int8_lightcnn9_extract,
        quantize_lightcnn9_params,
    )

    print("devices:", jax.devices(), file=sys.stderr)
    model = LightCNN9(num_classes=1000, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 128, 128, 1), np.float32))
    qparams = quantize_lightcnn9_params(variables["params"])
    int8_extract = make_int8_lightcnn9_extract(qparams)

    xs = jax.jit(lambda k: jax.random.uniform(
        k, (args.batches, args.batch, 128, 128, 1), jnp.float32))(
            jax.random.PRNGKey(1))

    def bench(tag, one_batch):
        @jax.jit
        def loop(xs):
            def body(acc, x):
                return acc + one_batch(x).sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
            return acc
        t0 = time.perf_counter()
        _ = float(loop(xs))
        print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(loop(xs))
            ts.append(time.perf_counter() - t0)
        rate = args.batch * args.batches / min(ts)
        print(f"{tag}: {rate:,.0f} emb/s")
        return rate

    def bf16_batch(x):
        _, feat = model.apply(variables, x, train=False)
        return l2_normalize(feat)

    r_bf16 = bench("bf16 (bench.py path)", bf16_batch)
    r_int8 = bench("int8 conv ladder     ", int8_extract)
    print(f"int8 / bf16: {r_int8 / r_bf16:.2f}x")

    # accuracy on the same weights
    probe = np.asarray(xs[0][:8])
    a = np.asarray(bf16_batch(jnp.asarray(probe)), np.float32)
    b = np.asarray(int8_extract(jnp.asarray(probe)), np.float32)
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    cos = (a * b).sum(1)
    print(f"embedding cosine int8 vs bf16: min {cos.min():.5f} "
          f"mean {cos.mean():.5f}")

    # ---- the SERVING net (EFMNet342, 64px) via the generic interceptor
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.quantized import (
        make_int8_extract,
    )

    emodel = EFMNet342(num_classes=1000, dtype=jnp.bfloat16)
    evars = emodel.init(jax.random.PRNGKey(0),
                        np.zeros((1, 64, 64, 1), np.float32))
    exs = jax.jit(lambda k: jax.random.uniform(
        k, (args.batches, args.batch, 64, 64, 1), jnp.float32))(
            jax.random.PRNGKey(2))
    xs = exs  # bench() closes over xs

    def efm_bf16(x):
        _, feat = emodel.apply(evars, x, train=False)
        return l2_normalize(feat)

    efm_int8 = make_int8_extract(emodel, evars)
    r_ebf = bench("efmnet342 bf16       ", efm_bf16)
    r_eq = bench("efmnet342 int8       ", efm_int8)
    print(f"efmnet342 int8 / bf16: {r_eq / r_ebf:.2f}x")
    a = np.asarray(efm_bf16(exs[0][:8]), np.float32)
    b = np.asarray(efm_int8(exs[0][:8]), np.float32)
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    cos = (a * b).sum(1)
    print(f"efmnet342 cosine int8 vs bf16: min {cos.min():.5f}")

    # ---- fused serving pipeline, int8 embed stage vs bf16 (250px frame,
    # 10k gallery — the perf_pipeline.py configuration)
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.pipeline import (
        MTCNNDetector,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        make_recognition_pipeline,
    )

    rng = np.random.default_rng(0)
    detector = MTCNNDetector()
    gallery = rng.normal(size=(10_000, 342)).astype(np.float32)
    frames = jax.jit(lambda k: jax.random.uniform(
        k, (64, 250, 250, 3), jnp.float32) * 255.0)(jax.random.PRNGKey(3))

    def bench_pipe(tag, int8_embed):
        pipe = make_recognition_pipeline(
            detector, emodel, evars, gallery, frame_h=250, frame_w=250,
            embed_size=64, thresholds=(0.45, 0.35, 0.3),
            sim_threshold=-1.0, int8_embed=int8_embed)

        @jax.jit
        def loop(frames):
            def body(acc, f):
                out = pipe(f)
                return acc + out["similarity"], None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), frames)
            return acc

        t0 = time.perf_counter()
        _ = float(loop(frames))
        print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(loop(frames))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / frames.shape[0] * 1e3
        print(f"{tag}: {ms:.2f} ms/frame")
        return ms

    ms_bf = bench_pipe("pipeline bf16 embed  ", False)
    ms_q = bench_pipe("pipeline int8 embed  ", True)
    print(f"pipeline int8-embed speedup: {ms_bf / ms_q:.2f}x "
          f"({ms_bf:.2f} -> {ms_q:.2f} ms/frame)")


if __name__ == "__main__":
    main()
