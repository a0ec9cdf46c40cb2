"""LFW 10-fold verification evaluation (BASELINE generator; SURVEY.md §6).

Given an image store + pairs file (or precomputed pair embeddings), extracts
embeddings with the chosen model and reports accuracy / VAL@FAR under the
facenet protocol semantics (facenet.py:428-520).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--embeddings", help=".npz with embeddings1, embeddings2, issame")
    p.add_argument("--images", help=".npz image store of pair images "
                               "(2N rows, interleaved) + issame array")
    p.add_argument("--export-dir", help="exported model dir (serve/export.py)")
    p.add_argument("--model", default="lightcnn29",
                   choices=["lightcnn29", "lightcnn9", "efmnet342",
                            "deepface"])
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--distance-metric", type=int, default=0, choices=[0, 1])
    p.add_argument("--subtract-mean", action="store_true")
    p.add_argument("--far-target", type=float, default=1e-3)
    p.add_argument("--folds", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--out", help="write results JSON here")
    return p


def _model_by_name(name: str, num_classes: int):
    import jax.numpy as jnp
    from ..models import DeepFace, EFMNet342, LightCNN29, LightCNN9

    cls = {"lightcnn29": LightCNN29, "lightcnn9": LightCNN9,
           "efmnet342": EFMNet342, "deepface": DeepFace}[name]
    return cls(num_classes=num_classes, dtype=jnp.bfloat16)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..eval import lfw

    if args.embeddings:
        with np.load(args.embeddings) as z:
            e1, e2, issame = z["embeddings1"], z["embeddings2"], z["issame"]
    elif args.images:
        import jax
        from ..extract import extract_features
        from ..serve.export import load_exported_params

        with np.load(args.images) as z:
            images, issame = z["images"], z["issame"]
        model = _model_by_name(args.model, args.num_classes)
        if args.export_dir:
            params, batch_stats, _ = load_exported_params(args.export_dir)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
        else:
            variables = model.init(
                jax.random.PRNGKey(0),
                np.zeros((1,) + images.shape[1:], np.float32))
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        emb, _, _ = extract_features(model, variables, images,
                                     batch_size=args.batch_size)
        e1, e2 = emb[0::2], emb[1::2]
    else:
        raise SystemExit("provide --embeddings or --images")

    tpr, fpr, acc, acc_std, val, val_std, far = lfw.evaluate(
        e1, e2, issame, nrof_folds=args.folds,
        distance_metric=args.distance_metric,
        subtract_mean=args.subtract_mean, far_target=args.far_target)
    result = {
        "accuracy_mean": acc, "accuracy_std": acc_std,
        "val": val, "val_std": val_std, "far": far,
        "n_pairs": int(len(issame)),
    }
    print(json.dumps(result))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
