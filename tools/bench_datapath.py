"""Data-path bench: streaming pack + shard-loader throughput at 1M rows.

VERDICT round-1 item 1 asks for a recorded imgs/s over a synthetic 1M-image
mmap store with flat RSS. Builds the store with ImageStoreWriter (chunked,
constant RAM), then measures ShardedPairBatcher epoch throughput (windowed
shuffle, uint8 pair batches — the exact feed of `train_backbone --images
<dir>`). Images are 32x32x1 to keep the store ~1 GB; per-image byte volume
scales linearly so 128x128 rates are ~16x lower per image, same bytes/s.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
    ImageStoreWriter,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.data.streaming import (
    ShardedPairBatcher,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows", type=int, default=1_000_000)
    p.add_argument("--side", type=int, default=32)
    p.add_argument("--ids", type=int, default=20_000)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--loader-batches", type=int, default=512,
                   help="batches to time (full epoch at 1M rows is ~1k)")
    p.add_argument("--keep", help="keep the store at this path")
    args = p.parse_args()

    root = args.keep or tempfile.mkdtemp(prefix="fx_datapath_")
    store = os.path.join(root, "store")
    chunk = 10_000
    rng = np.random.default_rng(0)
    template = (rng.random((chunk, args.side, args.side, 1)) * 255).astype(
        np.uint8)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    with ImageStoreWriter(store, (args.side, args.side, 1)) as w:
        for start in range(0, args.rows, chunk):
            n = min(chunk, args.rows - start)
            labels = rng.integers(0, args.ids, n)
            w.append(template[:n], labels)
    pack_s = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(json.dumps({
        "stage": "pack", "rows": args.rows,
        "imgs_per_sec": round(args.rows / pack_s, 1),
        "mb_per_sec": round(args.rows * args.side * args.side / pack_s / 1e6, 1),
        "rss_growth_mb": round((rss1 - rss0) / 1024, 1),
    }), flush=True)

    b = ShardedPairBatcher(store, args.batch_size, shuffle=True,
                           shuffle_window=65536, seed=0)
    it = iter(b)
    next(it)  # warm page cache path + positive index build
    t0 = time.perf_counter()
    n_done = 0
    for _ in range(args.loader_batches - 1):
        try:
            anc, pos, lab = next(it)
        except StopIteration:
            break
        n_done += anc.shape[0]
    load_s = time.perf_counter() - t0
    rss2 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(json.dumps({
        "stage": "load", "rows_read": 2 * n_done,  # anchor + positive
        "pair_batches_per_sec": round((args.loader_batches - 1) / load_s, 2),
        "imgs_per_sec": round(2 * n_done / load_s, 1),
        "rss_total_mb": round(rss2 / 1024, 1),
    }), flush=True)

    if not args.keep:
        shutil.rmtree(root)


if __name__ == "__main__":
    main()
