"""Extraction throughput for ANY backbone (the bench.py methodology,
generalized): embeddings/sec/chip + MFU from XLA's own FLOP count.

bench.py pins the driver headline on LightCNN9; VERDICT r3 item 7 asks
for the same number on the nets the reference actually ships. One scan
program chains the batches with a scalar fetch (tunnel-safe timing),
MFU uses compiled cost analysis — no analytic constants to drift.

    python tools/perf_extract.py                         # all models
    python tools/perf_extract.py --model lightcnn29 --batch 64 128
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    compiled_flops,
    enable_compilation_cache,
)

enable_compilation_cache()

PEAK_BF16_TFLOPS = 197.0  # v5e nominal

# model -> (ctor, input px) at the reference's shipped resolutions
CONFIGS = {
    "lightcnn9": ("LightCNN9", 128),
    "lightcnn29": ("LightCNN29", 128),
    "efmnet342": ("EFMNet342", 64),
    "deepface": ("DeepFace", 152),
}


def bench_model(name: str, batch: int, n_batches: int = 64,
                int8: bool = False) -> dict:
    from improving_face_recognition_performance_using_triplet_loss_tpu import (
        models,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.distances import (
        l2_normalize,
    )

    cls_name, px = CONFIGS[name]
    model = getattr(models, cls_name)(num_classes=1000, dtype=jnp.bfloat16)
    xs = jax.jit(lambda k: jax.random.uniform(
        k, (n_batches, batch, px, px, 1), jnp.float32))(jax.random.PRNGKey(1))
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, px, px, 1), np.float32))

    if int8:
        import flax.linen as nn

        from improving_face_recognition_performance_using_triplet_loss_tpu.ops.quantized import (
            int8_conv_interceptor,
        )

        def fwd(variables, x):
            with nn.intercept_methods(int8_conv_interceptor()):
                _, feat = model.apply(variables, x, train=False)
            return l2_normalize(feat)
    else:
        def fwd(variables, x):
            _, feat = model.apply(variables, x, train=False)
            return l2_normalize(feat)

    flops = compiled_flops(fwd, variables, np.zeros((batch, px, px, 1),
                                                    np.float32))
    per_image = (flops / batch) if flops else float("nan")

    @jax.jit
    def extract_all(variables, xs):
        def body(acc, x):
            return acc + fwd(variables, x).sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return acc

    t0 = time.perf_counter()
    float(extract_all(variables, xs))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(extract_all(variables, xs))
        best = min(best, time.perf_counter() - t0)
    emb_s = batch * n_batches / best
    return {
        "model": name, "px": px, "batch": batch, "int8": int8,
        "emb_per_sec": round(emb_s, 1),
        "mfu_pct": round(emb_s * per_image / (PEAK_BF16_TFLOPS * 1e12)
                         * 100, 1),
        "gflops_per_image": round(per_image / 1e9, 3),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", nargs="*", default=list(CONFIGS),
                    choices=list(CONFIGS))
    ap.add_argument("--batch", type=int, nargs="*", default=[128])
    ap.add_argument("--n-batches", type=int, default=64)
    ap.add_argument("--int8", action="store_true",
                    help="route eligible convs through the int8 MXU path "
                         "(ops/quantized.py interceptor; the MFU "
                         "denominator stays the bf16 peak so rows are "
                         "comparable)")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    for name in args.model:
        for b in args.batch:
            try:
                print(json.dumps(bench_model(name, b, args.n_batches,
                                              int8=args.int8)),
                      flush=True)
            except Exception as e:
                print(json.dumps({"model": name, "batch": b,
                                  "error": f"{type(e).__name__}: "
                                           f"{str(e)[:120]}"}), flush=True)


if __name__ == "__main__":
    main()
