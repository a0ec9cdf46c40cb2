"""On-TPU training-step throughput + MFU: joint id+triplet backbone step.

Chains N steps in one lax.scan (same timing method as bench.py: one
dispatch, scalar fetch) and reports ms/step, images/sec, and TRAIN-STEP
MFU where the FLOP numerator comes from XLA's own cost analysis of the
compiled scan program (fwd+bwd+optimizer; HloCostAnalysis counts the scan
body once, so that count IS one step) — not an analytic constant
(VERDICT r2 items 3+7).

    python tools/perf_train.py            # reference configs (B=64)
    python tools/perf_train.py --sweep    # batch sweep 64 -> 2048
"""

import argparse
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

PEAK_BF16_TFLOPS = 197.0  # v5e nominal


def bench_backbone(model_name: str, size: int, batch: int, n_steps: int = 8,
                   bf16: bool = True, mining: str = "semi_hard",
                   bwd_im2col: bool = False, remat: str | None = None):
    """Returns (ms_per_step, imgs_per_sec, mfu_pct)."""
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = {"efmnet342": EFMNet342, "lightcnn29": LightCNN29}[model_name](
        num_classes=1000, dtype=dtype)
    tx = adam_factor(base_lr=2.4e-4, decay_every_steps=10_000)
    key = jax.random.PRNGKey(0)
    # generate batches on device (don't push GBs through the host link)
    anc = jax.jit(lambda k: jax.random.uniform(
        k, (batch, size, size, 1), jnp.float32))(key)
    pos = jax.jit(lambda k: jax.random.uniform(
        k, (batch, size, size, 1), jnp.float32))(jax.random.fold_in(key, 1))
    labels = jnp.arange(batch) % 100
    state = create_train_state(model, tx, key, anc)
    step = make_backbone_train_step(model, tx, mining_mode=mining,
                                    bwd_im2col=bwd_im2col,
                                    remat_policy=remat)

    def run(state):
        def body(s, _):
            s, metrics = step(s, anc, pos, labels)
            return s, metrics["loss"]

        s, losses = jax.lax.scan(body, state, None, length=n_steps)
        return losses[-1]

    t0 = time.perf_counter()
    compiled = jax.jit(run).lower(state).compile()
    # the MFU numerator: XLA's FLOP count of the compiled program.
    # HloCostAnalysis counts a while/scan BODY ONCE regardless of trip
    # count (verified: flops identical for length 1/4/8), so the scanned
    # program's count IS one step's flops (fwd+bwd+mining+Adam) plus
    # negligible outside ops — no division by n_steps
    flops_per_step = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", -1.0))
        if f > 0:
            flops_per_step = f
    except Exception:
        pass
    _ = float(compiled(state))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(compiled(state))
        best = min(best, time.perf_counter() - t0)
    per_step = best / n_steps
    imgs = 2 * batch / per_step  # anchor + positive halves per step
    mfu = (flops_per_step / per_step / (PEAK_BF16_TFLOPS * 1e12) * 100
           if flops_per_step else float("nan"))
    gf = flops_per_step / 1e9 if flops_per_step else float("nan")
    tag = f" remat={remat}" if remat else ""
    print(f"{model_name} {size}px b={batch} {mining}{tag}: "
          f"{per_step * 1000:7.1f} ms/step, {imgs:9,.0f} imgs/s, "
          f"MFU {mfu:4.1f}% ({gf:,.0f} GFLOP/step; compile {compile_s:.0f}s)")
    return per_step * 1000, imgs, mfu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="batch sweep 64->2048 for both backbones")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--model", choices=("lightcnn29", "efmnet342"),
                    help="restrict the sweep to one backbone")
    ap.add_argument("--batches", type=int, nargs="+",
                    help="restrict the sweep to these batch sizes")
    ap.add_argument("--remat", choices=("full", "dots"),
                    help="jax.checkpoint policy on the model apply (the "
                         "round-4 bandwidth counter-experiment)")
    ap.add_argument("--bwd-im2col", action="store_true",
                    help="route conv filter gradients through the im2col "
                         "matmul formulation (ops/conv_backward.py) — the "
                         "round-4 backward-MFU counter-experiment")
    args = ap.parse_args()

    print("devices:", jax.devices(), file=sys.stderr)
    if not args.sweep:
        # the reference's joint-train config: LightCNN-29, 128px, batch 64
        bench_backbone("lightcnn29", 128, 64, n_steps=args.steps,
                       bwd_im2col=args.bwd_im2col, remat=args.remat)
        bench_backbone("efmnet342", 64, 64, n_steps=args.steps,
                       bwd_im2col=args.bwd_im2col, remat=args.remat)
        return

    results = {}
    for name, size in (("lightcnn29", 128), ("efmnet342", 64)):
        if args.model and name != args.model:
            continue
        rows = []
        for batch in (args.batches or (64, 128, 256, 512, 1024, 2048)):
            try:
                rows.append((batch, *bench_backbone(
                    name, size, batch, n_steps=args.steps,
                    bwd_im2col=args.bwd_im2col, remat=args.remat)))
            except Exception as e:  # OOM at the top end is a finding
                print(f"{name} b={batch}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")
                break
        results[name] = rows
        if rows:
            best = max(rows, key=lambda r: r[2])
            print(f"--> {name} throughput-optimal: b={best[0]} "
                  f"({best[2]:,.0f} imgs/s, MFU {best[3]:.1f}%)")
    return results


if __name__ == "__main__":
    main()
