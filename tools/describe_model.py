"""Model architecture tables — the counterpart of the reference's
lightcnn_gluon.pdf / lightcnn_symbol.pdf network diagrams (mx.viz exports):
flax nn.tabulate renders every layer with shapes and param counts.

    python tools/describe_model.py [--model all] [--size 64] [--out FILE]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=["all", "lightcnn29", "efmnet342", "lightcnn9",
                             "deepface"])
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--out", help="write the tables to this file")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        DeepFace,
        EFMNet342,
        LightCNN9,
        LightCNN29,
    )

    builders = {
        "lightcnn29": (lambda: LightCNN29(num_classes=args.num_classes),
                       (args.size, args.size, 1)),
        "efmnet342": (lambda: EFMNet342(num_classes=args.num_classes),
                      (args.size, args.size, 1)),
        "lightcnn9": (lambda: LightCNN9(num_classes=args.num_classes),
                      (128, 128, 1)),
        "deepface": (lambda: DeepFace(num_classes=args.num_classes),
                     (152, 152, 3)),
    }
    names = (list(builders) if args.model == "all" else [args.model])
    chunks = []
    for name in names:
        build, shape = builders[name]
        model = build()
        x = np.zeros((1,) + shape, np.float32)
        table = nn.tabulate(
            model, jax.random.PRNGKey(0),
            compute_flops=False, compute_vjp_flops=False)(x, train=False)
        chunks.append(f"## {name} (input {shape})\n\n{table}\n")
        print(chunks[-1])
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(chunks))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
