"""Celeb1M dress rehearsal: a six-figure-row mmap store trained end-to-end
on the real chip with flat RSS (VERDICT round-1 item 1's spirit, proven in
anger rather than unit tests).

Builds a synthetic identity-clustered image store of --rows images at 128px
via the streaming writer (constant RAM), then runs ONE epoch of
`train_backbone`-equivalent training (streaming shard loader, uint8 batches
normalized on device, fused joint step) and reports imgs/s + peak RSS.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_store(root: str, rows: int, ids: int, size: int) -> str:
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
        ImageStoreWriter,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (
        synthetic_faces,
    )

    # a pool of identity patterns, tiled with per-chunk noise: identity
    # structure without holding more than one chunk in RAM
    pool_ids = min(ids, 512)
    base, base_labels = synthetic_faces(num_ids=pool_ids, per_id=1,
                                        size=size, seed=0)
    order = np.argsort(base_labels)
    base = (base[order, :, :, 0] * 255).astype(np.uint8)  # [pool, S, S]
    rng = np.random.default_rng(1)
    store = os.path.join(root, "store")
    chunk = 4096
    t0 = time.perf_counter()
    with ImageStoreWriter(store, (size, size, 1)) as w:
        written = 0
        while written < rows:
            n = min(chunk, rows - written)
            labs = rng.integers(0, ids, n)
            imgs = base[labs % pool_ids].astype(np.int16)
            imgs = np.clip(imgs + rng.integers(-12, 13, imgs.shape), 0,
                           255).astype(np.uint8)[..., None]
            w.append(imgs, labs)
            written += n
    dt = time.perf_counter() - t0
    print(json.dumps({"stage": "pack", "rows": rows,
                      "imgs_per_sec": round(rows / dt, 1)}), flush=True)
    return store


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows", type=int, default=100_000)
    p.add_argument("--ids", type=int, default=2_000)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--model", default="lightcnn9")
    p.add_argument("--max-steps", type=int, default=0,
                   help="cap steps (0 = full epoch)")
    p.add_argument("--scan-chunk", type=int, default=0,
                   help="chain K steps per dispatch (train.make_scanned_step)")
    p.add_argument("--keep", help="keep the store at this path")
    args = p.parse_args()

    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli.train_backbone import (
        _model_by_name,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.streaming import (
        ShardedPairBatcher,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        adam_factor,
        create_train_state,
        make_backbone_train_step,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    root = args.keep or tempfile.mkdtemp(prefix="fx_rehearsal_")
    store = build_store(root, args.rows, args.ids, args.size)

    batcher = ShardedPairBatcher(store, args.batch_size, shuffle=True,
                                 shuffle_window=65536, seed=0)
    model = _model_by_name(args.model, args.ids, bf16=True)
    tx = adam_factor(base_lr=2.4e-4, decay_every_steps=10_000)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        np.zeros((1, args.size, args.size, 1), np.float32))
    raw_step = make_backbone_train_step(model, tx, mining_mode="random")
    k = max(args.scan_chunk, 0)
    if k > 1:
        from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
            make_scanned_step,
        )

        step = make_scanned_step(raw_step)
    else:
        step = jax.jit(raw_step)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    n_steps = len(batcher) if not args.max_steps else min(args.max_steps,
                                                          len(batcher))
    t_first = None
    t0 = time.perf_counter()
    done = 0
    done_at_first = 0
    loss = float("nan")
    group = []
    for batch in batcher:
        if k > 1:
            group.append(batch)
            if len(group) < k:
                continue
            anc, pos, lab = (np.stack(p) for p in zip(*group))
            group = []
        else:
            anc, pos, lab = batch
        state, metrics = step(state, anc, pos, lab)
        done += k if k > 1 else 1
        if t_first is None:
            loss = float(np.asarray(metrics["loss"]).ravel()[-1])
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            done_at_first = done
        if done >= n_steps:
            break
    loss = float(np.asarray(metrics["loss"]).ravel()[-1])  # sync the tail
    dt = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    steady = done - done_at_first
    print(json.dumps({
        "stage": "train", "model": args.model, "rows": args.rows,
        "steps": done, "compile_first_s": round(t_first, 1),
        "imgs_per_sec": round(steady * args.batch_size / dt, 1),
        "step_ms": round(dt / max(steady, 1) * 1e3, 2),
        "final_loss": round(loss, 4),
        "rss_peak_gb": round(rss1 / 1024 / 1024, 2),
        "rss_growth_during_run_gb": round((rss1 - rss0) / 1024 / 1024, 2),
        "devices": str(jax.devices()),
    }), flush=True)
    if not args.keep:
        import shutil

        shutil.rmtree(root)


if __name__ == "__main__":
    main()
