"""Fused-front A/B on the real chip: the XLA conv path for the LightCNN9
conv1..pool2 prefix vs the single-kernel Pallas chain
(ops/pallas/front_kernel.py) at the bench geometry.

The prefix under test is ~73% of the measured extraction batch
(tools/perf_layers.py round-3 table: conv1 2.37 + conv2a 0.76 + conv2
1.70 ms of 6.6 ms at B=256); docs/DESIGN.md names the one-VMEM-residency
chain as the last extraction lever (VERDICT r2 item 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas import (
    front9_chain_pallas,
    front9_reference,
    pack_front9_weights,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

B = int(os.environ.get("PF_BATCH", "128"))
ITERS = int(os.environ.get("PF_ITERS", "64"))
SIZE = int(os.environ.get("PF_SIZE", "128"))
TILE_B = int(os.environ.get("PF_TILE_B", "4"))


def _params(seed=0, c1=96, c2a=96, c2=192):
    rng = np.random.default_rng(seed)

    def t(shape, s):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)

    return {
        "conv1": {"kernel": t((5, 5, 1, c1), 0.1), "bias": t((c1,), 0.1)},
        "conv2a": {"kernel": t((1, 1, c1 // 2, c2a), 0.1),
                   "bias": t((c2a,), 0.1)},
        "conv2": {"kernel": t((3, 3, c2a // 2, c2), 0.05),
                  "bias": t((c2,), 0.1)},
    }


def timed(build, label, fixed_s):
    """build(x_dep) -> output; the caller perturbs x to defeat hoisting."""

    @jax.jit
    def run(x):
        def body(acc, _):
            x_dep = x + (acc * 1e-24).astype(x.dtype)
            y = build(x_dep)
            return acc + y.sum(dtype=jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=ITERS)
        return acc

    x = jax.jit(lambda k: jax.random.normal(
        k, (B, SIZE, SIZE, 1), jnp.bfloat16))(jax.random.PRNGKey(7))
    t0 = time.perf_counter()
    float(run(x))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    dt = max(min(ts) - fixed_s, 1e-9) / ITERS
    print(json.dumps({"variant": label, "ms_per_batch": round(dt * 1e3, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
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
    print(json.dumps({"devices": str(jax.devices()), "B": B, "size": SIZE,
                      "iters": ITERS, "tile_b": TILE_B}), flush=True)
    params = _params()
    packed = pack_front9_weights(params, dtype=jnp.bfloat16)
    fixed = null_fixed()
    print(json.dumps({"fixed_dispatch_ms": round(fixed * 1e3, 1)}),
          flush=True)

    t_ref = timed(lambda x: front9_reference(x, params), "xla_chain", fixed)
    t_pl = timed(
        lambda x: front9_chain_pallas(x, packed, pool="rows", tile_b=TILE_B,
                                      interpret=False),
        "pallas_chain", fixed)
    print(json.dumps({"speedup": round(t_ref / t_pl, 3)}), flush=True)
    if os.environ.get("PF_ABLATE"):
        for stages, label in ((1, "ablate_stem_only"),
                              (2, "ablate_thru_conv2a")):
            timed(lambda x, s=stages: front9_chain_pallas(
                x, packed, pool="rows", tile_b=TILE_B, interpret=False,
                stages=s), label, fixed)
        try:
            t_sl = timed(lambda x: front9_chain_pallas(
                x, packed, pool="rows", tile_b=TILE_B, interpret=False,
                wtap="slice3d"), "pallas_chain_slice3d", fixed)
            print(json.dumps({"speedup_slice3d": round(t_ref / t_sl, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"slice3d_error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
