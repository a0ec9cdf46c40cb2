"""Stem fusion A/B on the real chip: baseline conv+mfm+pool vs the
space-to-depth fused stem (ops/s2d_stem.py) at the bench configuration."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.ops.s2d_stem import (
    reference_stem,
    stem_conv_maxout_pool,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

B = int(os.environ.get("PS_BATCH", "256"))
ITERS = int(os.environ.get("PS_ITERS", "64"))


def timed(fn, x, w, b, label, fixed_s):
    @jax.jit
    def run(x, w, b):
        def body(acc, _):
            w_dep = w + (acc * 1e-24).astype(w.dtype)  # defeat hoisting
            y = fn(x, w_dep, b)
            return acc + y.sum(dtype=jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=ITERS)
        return acc

    float(run(x, w, b))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x, w, b))
        ts.append(time.perf_counter() - t0)
    dt = max(min(ts) - fixed_s, 1e-9) / ITERS
    print(json.dumps({"variant": label, "ms_per_batch": round(dt * 1e3, 3)}),
          flush=True)
    return dt


def null_fixed():
    z = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def run(z):
        def body(acc, _):
            return acc + z.sum() * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=ITERS)
        return acc

    float(run(z))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(z))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, 128, 128, 1), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(rng, 1), (5, 5, 1, 96),
                          jnp.bfloat16) * 0.05
    b = jnp.zeros((96,), jnp.bfloat16)
    fixed = null_fixed()
    print(f"fixed dispatch {fixed*1e3:.1f} ms (subtracted); B={B}, "
          f"iters={ITERS}", file=sys.stderr, flush=True)

    # numerics on-chip first
    got = stem_conv_maxout_pool(x[:2], w, b)
    want = reference_stem(x[:2], w, b)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(json.dumps({"variant": "max_abs_err", "value": err}), flush=True)

    base = timed(reference_stem, x, w, b, "baseline conv+mfm+pool", fixed)
    fused = timed(stem_conv_maxout_pool, x, w, b, "s2d fused stem (XLA)",
                  fixed)
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas.stem_kernel import (
        stem_conv_maxout_pool_pallas,
    )

    errp = float(jnp.max(jnp.abs(
        stem_conv_maxout_pool_pallas(x[:2], w, b).astype(jnp.float32)
        - reference_stem(x[:2], w, b).astype(jnp.float32))))
    print(json.dumps({"variant": "pallas_max_abs_err", "value": errp}),
          flush=True)
    pallas_t = timed(stem_conv_maxout_pool_pallas, x, w, b,
                     "s2d fused stem (pallas epilogue)", fixed)
    print(json.dumps({
        "variant": "speedup",
        "xla_fused_vs_base": round(base / fused, 2),
        "pallas_vs_base": round(base / pallas_t, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
