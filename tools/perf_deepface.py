"""DeepFace real-chip perf: train step ms + extraction imgs/s at the
canonical 152x152x3 input (VERDICT round-1 item 2 BASELINE row).

Timing rule (verify skill): chain steps in one lax.scan program and fetch a
scalar — per-dispatch timing through the tunnel lies.
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
import optax

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    DeepFace,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
    create_train_state,
    make_backbone_train_step,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)


def timed_scan(fn, carry, n, label):
    """Run fn n times chained via lax.scan, return seconds/iter."""
    @jax.jit
    def prog(c):
        c, _ = jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=n)
        return c

    t0 = time.perf_counter()
    out = prog(carry)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready(), out)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # force fetch
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = prog(carry)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    run_s = time.perf_counter() - t0
    print(f"{label}: compile+1st {compile_s:.1f}s, {run_s / n * 1e3:.2f} "
          f"ms/iter", flush=True)
    return run_s / n


def main():
    enable_compilation_cache()
    batch = int(os.environ.get("DF_BATCH", "32"))
    n_iters = int(os.environ.get("DF_ITERS", "20"))
    rng = np.random.default_rng(0)
    model = DeepFace(num_classes=1000, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(batch, 152, 152, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
    tx = optax.adam(1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x[:1])
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    print(f"DeepFace params: {n_params/1e6:.1f}M, batch {batch}, "
          f"devices={jax.devices()}", flush=True)

    step = make_backbone_train_step(model, tx)

    def train_once(st):
        st, _ = step(st, x, x, labels)
        return st

    train_s = timed_scan(train_once, state, n_iters, "train step")

    # params ride as a carry element (NOT a closure constant — 233M f32
    # constants overflow the remote-compile request)
    def extract_once(carry):
        acc, params = carry
        _, feat = model.apply({"params": params}, x, train=False)
        return acc + feat.sum(), params

    ext_s = timed_scan(extract_once, (jnp.zeros(()), state.params), n_iters,
                       "extract")

    print(json.dumps({
        "model": "deepface", "batch": batch,
        "train_step_ms": round(train_s * 1e3, 2),
        "train_imgs_per_sec": round(2 * batch / train_s, 1),
        "extract_imgs_per_sec": round(batch / ext_s, 1),
        "params_millions": round(n_params / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
