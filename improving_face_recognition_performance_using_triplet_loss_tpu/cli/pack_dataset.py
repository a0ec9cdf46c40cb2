"""Pack a folder-of-identities image tree into an image store.

The reference's data flow runs aligned crops through MXNet's ``im2rec`` into
train.rec/.lst files (SURVEY.md §1 data flow; every trainer reads them,
train_efm.py:135-136). The equivalent here: walk ``input_dir/<class>/*``,
decode + grayscale + resize with cv2, and write a packed .npz (or
memory-mapped .npy pair) image store plus a labels->class-name json.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_dir", help="class-per-directory image tree")
    p.add_argument("output", help="output .npz path (or directory with "
                                  "--mmap)")
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--color", action="store_true",
                   help="keep RGB (default grayscale, reference channel=1)")
    p.add_argument("--mmap", action="store_true",
                   help="write mmap-able .npy pair for Celeb1M-scale sets")
    p.add_argument("--train-frac", type=float,
                   help="also write <output>_train/<output>_test splits by "
                        "identity at this fraction")
    return p


def pack_tree(input_dir: str, image_size: int, color: bool):
    import cv2
    import numpy as np

    images, labels, names = [], [], []
    skipped = 0
    for cls in sorted(os.listdir(input_dir)):
        cdir = os.path.join(input_dir, cls)
        if not os.path.isdir(cdir):
            continue
        cls_id = len(names)
        names.append(cls)
        for fname in sorted(os.listdir(cdir)):
            img = cv2.imread(os.path.join(cdir, fname))
            if img is None:
                skipped += 1
                continue
            if color:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            else:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[..., None]
            img = cv2.resize(img, (image_size, image_size),
                             interpolation=cv2.INTER_AREA)
            if img.ndim == 2:
                img = img[..., None]
            images.append(img)
            labels.append(cls_id)
    if not images:
        raise SystemExit(f"no decodable images under {input_dir}")
    return (np.asarray(images, np.uint8), np.asarray(labels, np.int64),
            names, skipped)


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np

    from ..data.feature_store import split_identities
    from ..data.records import save_image_store, save_image_store_mmap

    images, labels, names, skipped = pack_tree(args.input_dir,
                                               args.image_size, args.color)
    if args.mmap:
        save_image_store_mmap(args.output, images, labels)
        meta_path = os.path.join(args.output, "classes.json")
    else:
        save_image_store(args.output, images, labels)
        meta_path = os.path.splitext(args.output)[0] + ".classes.json"
    with open(meta_path, "w") as f:
        json.dump({"classes": names}, f)
    print(f"packed {images.shape[0]} images / {len(names)} identities "
          f"({skipped} skipped) -> {args.output}")

    if args.train_frac:
        train_mask, test_mask = split_identities(labels, args.train_frac)
        base = (args.output if args.mmap
                else os.path.splitext(args.output)[0])
        save_image_store(base + "_train.npz", images[train_mask],
                         labels[train_mask])
        save_image_store(base + "_test.npz", images[test_mask],
                         labels[test_mask])
        print(f"splits: {int(train_mask.sum())} train / "
              f"{int(test_mask.sum())} test rows (by identity)")
    return images.shape[0], len(names)


if __name__ == "__main__":
    main()
