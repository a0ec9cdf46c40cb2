"""Batch feature extraction (reference extract_feacture_v2.py).

Streams an image store through a trained model, writing L2-normalized
feature rows + labels in the reference CSV layout
(feature_vector_{train,valid}.csv / label_{train,valid}.csv,
extract_feacture_v2.py:68-79,95-106) and the canonical .npz store, printing
per-split accuracy.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-images", help="train image store: .npz, or a "
                                          "directory = streaming mmap store")
    p.add_argument("--valid-images", help="valid image store (.npz or mmap "
                                          "directory)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--export-dir", help="exported model (serve/export.py); "
                                        "random init if omitted")
    p.add_argument("--model", default="lightcnn29",
                   choices=["lightcnn29", "efmnet342", "lightcnn9",
                            "deepface"])
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--out-dir", default="runs/extract")
    p.add_argument("--batch-size", type=int, default=128)  # B=128 tiles the MXU batch dim exactly (docs/DESIGN.md sweep)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each extraction batch over every visible "
                        "device (batch-size must divide the device count) "
                        "— bulk Celeb1M-scale extraction on a pod")
    p.add_argument("--int8", action="store_true",
                   help="run every eligible conv on the int8 MXU path "
                        "(ops/quantized.py generic interceptor) — measured "
                        "1.11x on LightCNN9 bulk extraction, embedding "
                        "cosine >= 0.9998 vs bf16 (BASELINE.md); no-win on "
                        "small-input EFMNet342, so it stays opt-in")
    return p


def _extract_split(model, variables, images, labels, out_dir, split,
                   batch_size, log, data_parallel=False, int8=False):
    from ..data.feature_store import (save_feature_store, write_feature_csv,
                                      write_labels_csv)
    from ..extract import extract_features

    tic = time.time()
    feats, labels, acc = extract_features(
        model, variables, images, labels, batch_size=batch_size,
        data_parallel=data_parallel, int8=int8)
    name = {"train": "train", "valid": "valid"}[split]
    fcsv = os.path.join(out_dir, f"feature_vector_{name}.csv")
    lcsv = os.path.join(out_dir, f"label_{name}.csv")
    for pth in (fcsv, lcsv):
        if os.path.exists(pth):
            os.remove(pth)
    write_feature_csv(fcsv, feats)
    write_labels_csv(lcsv, labels)
    save_feature_store(os.path.join(out_dir, f"{name}.npz"), feats, labels)
    log.info("[%s] %d rows, dim %d, acc %.4f, %.1f sec", split,
             feats.shape[0], feats.shape[1], acc, time.time() - tic)
    return feats, labels, acc


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from ._common import setup_logging, log_config
    from .train_backbone import _model_by_name
    from ..data.records import load_image_store
    from ..data.synthetic import synthetic_faces
    from ..serve.export import load_exported_params
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    log = setup_logging(os.path.join(args.out_dir, "log"), "extract")
    log_config(log, args)
    os.makedirs(args.out_dir, exist_ok=True)

    splits = {}
    if args.synthetic:
        size, ch = ((72, 3) if args.model == "deepface" else (64, 1))
        if args.export_dir:
            # the export manifest knows the trained input size; a fixture at
            # any other size would fail at the dense layer
            import json

            with open(os.path.join(args.export_dir, "manifest.json")) as f:
                inp = json.load(f)["input"]
            size, ch = inp["height"], inp["channels"]
        tr = synthetic_faces(num_ids=8, per_id=8, size=size, channels=ch)
        va = synthetic_faces(num_ids=8, per_id=4, size=size, channels=ch,
                             seed=1)
        splits = {"train": tr, "valid": va}
    else:
        def _load(path):
            if os.path.isdir(path):  # streaming mmap store: stays uint8,
                from ..data.records import load_image_store_mmap

                return load_image_store_mmap(path)  # normalized on device
            return load_image_store(path)

        if args.train_images:
            splits["train"] = _load(args.train_images)
        if args.valid_images:
            splits["valid"] = _load(args.valid_images)
    if not splits:
        raise SystemExit("provide --train-images/--valid-images or --synthetic")

    if args.export_dir:
        params, batch_stats, manifest = load_exported_params(args.export_dir)
        # class count comes from the trained classifier kernel, not a flag
        # (fc2 on the grayscale ladders, f8 on deepface)
        head = params.get("fc2") or params.get("f8")
        num_classes = (int(head["kernel"].shape[1]) if head
                       else args.num_classes)
        model = _model_by_name(manifest.get("model", args.model),
                               num_classes, args.bf16)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
    else:
        model = _model_by_name(args.model, args.num_classes, args.bf16)
        sample = next(iter(splits.values()))[0][:1]
        if sample.dtype == np.uint8:
            sample = sample.astype(np.float32) / 255.0
        variables = model.init(jax.random.PRNGKey(0), sample)
        log.warning("no --export-dir: using randomly initialized %s",
                    args.model)

    results = {}
    for split, (images, labels) in splits.items():
        # uint8 stays uint8 (memmaps slice lazily per batch and normalize
        # on device) — a whole-array float conversion is 4x RAM and a
        # 300 GB materialization at Celeb1M scale
        results[split] = _extract_split(
            model, variables, images, labels, args.out_dir, split,
            args.batch_size, log, data_parallel=args.data_parallel,
            int8=args.int8)
    return results


if __name__ == "__main__":
    main()
