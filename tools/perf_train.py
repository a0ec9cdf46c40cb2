"""On-TPU training-step throughput: joint id+triplet backbone step.

Chains N steps in one lax.scan (same timing method as bench.py) and reports
images/sec for the reference's training configs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    EFMNet342, LightCNN29,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
    adam_factor, create_train_state, make_backbone_train_step,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

enable_compilation_cache()


def bench_backbone(model_name: str, size: int, batch: int, n_steps: int = 20,
                   bf16: bool = True, mining: str = "semi_hard"):
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = {"efmnet342": EFMNet342, "lightcnn29": LightCNN29}[model_name](
        num_classes=1000, dtype=dtype)
    tx = adam_factor(base_lr=2.4e-4, decay_every_steps=10_000)
    key = jax.random.PRNGKey(0)
    anc = jax.random.uniform(key, (batch, size, size, 1), jnp.float32)
    pos = jax.random.uniform(jax.random.fold_in(key, 1),
                             (batch, size, size, 1), jnp.float32)
    labels = jnp.arange(batch) % 100
    state = create_train_state(model, tx, key, anc)
    step = make_backbone_train_step(model, tx, mining_mode=mining)

    @jax.jit
    def run(state):
        def body(s, _):
            s, metrics = step(s, anc, pos, labels)
            return s, metrics["loss"]

        s, losses = jax.lax.scan(body, state, None, length=n_steps)
        return losses[-1]

    t0 = time.perf_counter()
    _ = float(run(state))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(state))
        best = min(best, time.perf_counter() - t0)
    per_step = best / n_steps
    # each step forwards 2*batch images (anchor + positive halves)
    print(f"{model_name} {size}px b={batch} {mining}: "
          f"{per_step*1000:.1f} ms/step, "
          f"{2*batch/per_step:.0f} imgs/sec (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    # the reference's joint-train config: LightCNN-29, 128px, batch 64
    bench_backbone("lightcnn29", 128, 64)
    bench_backbone("efmnet342", 64, 64)
