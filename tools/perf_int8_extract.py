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


if __name__ == "__main__":
    main()
