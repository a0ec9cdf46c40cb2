"""On-TPU kernel perf + correctness: fused Pallas mining vs XLA baseline.

Run on the real chip: ``python tools/perf_kernels.py``. Uses the
scan+scalar-fetch timing method (block_until_ready lies on the tunneled
backend — see .claude/skills/verify/SKILL.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.ops import (
    distances as D,
    mining as MI,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas import (
    semi_hard_mining_pallas,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

enable_compilation_cache()


def timed(fn, *args, iters=10):
    out = fn(*args)          # compile
    _ = float(jnp.sum(out))  # force
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(iters):
            acc = acc + jnp.sum(fn(*args))
        _ = float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    b, n, d, ids = 8192, 16384, 342, 1000
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    anc = D.l2_normalize(jax.random.normal(k1, (b, d), jnp.float32))
    pool = D.l2_normalize(jax.random.normal(k2, (n, d), jnp.float32))
    anc_lab = jax.random.randint(k3, (b,), 0, ids)
    pool_lab = jax.random.randint(k4, (n,), 0, ids)
    pos_sq = jax.random.uniform(k1, (b,), jnp.float32, 0.5, 2.0)

    @jax.jit
    def baseline(anc, pos_sq, anc_lab, pool, pool_lab):
        sq = D.pairwise_sq_l2(anc, pool)
        return MI.mine_semi_hard_negative(sq, pos_sq, anc_lab, pool_lab)

    @jax.jit
    def fused(anc, pos_sq, anc_lab, pool, pool_lab):
        return semi_hard_mining_pallas(anc, pos_sq, anc_lab, pool, pool_lab,
                                       tile_b=256, tile_n=512)

    ref = np.asarray(baseline(anc, pos_sq, anc_lab, pool, pool_lab))
    got = np.asarray(fused(anc, pos_sq, anc_lab, pool, pool_lab))
    match = (ref == got).mean()
    print(f"agreement: {match:.6f} ({(ref != got).sum()} mismatches of {b})")

    t_base = timed(baseline, anc, pos_sq, anc_lab, pool, pool_lab)
    t_fused = timed(fused, anc, pos_sq, anc_lab, pool, pool_lab)
    hbm_saved = b * n * 4 / 1e9
    print(f"B={b} N={n} D={d}")
    print(f"baseline (materialized [B,N]): {t_base*1000:.2f} ms")
    print(f"fused pallas:                  {t_fused*1000:.2f} ms "
          f"({t_base/t_fused:.2f}x, avoids {hbm_saved:.2f} GB intermediate)")


if __name__ == "__main__":
    main()
