"""Dataset alignment CLI (reference align_dataset_mtcnn.py:124-139 + align.sh).

Walks input_dir/<class>/*.jpg, detects with MTCNN, writes aligned PNG crops
and a bounding_boxes log to output_dir.
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("--image-size", type=int, default=182)
    p.add_argument("--margin", type=int, default=44)
    p.add_argument("--minsize", type=int, default=20)
    p.add_argument("--thresholds", type=float, nargs=3,
                   default=[0.6, 0.7, 0.7])
    p.add_argument("--factor", type=float, default=0.709)
    p.add_argument("--detect-multiple-faces", action="store_true")
    p.add_argument("--det-weights", nargs=3, metavar=("DET1", "DET2", "DET3"),
                   help="det1/det2/det3 .npy weight files (random init "
                        "otherwise — for pipeline testing only)")
    p.add_argument("--export-native-mtcnn", metavar="NPZ",
                   help="also write the detector weights as the flat .npz "
                        "the native cascade reads "
                        "(cpp/include/facejax/mtcnn.hpp)")
    p.add_argument("--device-cascade", action="store_true",
                   help="fully-fused on-device cascade (one dispatch per "
                        "image; ~26x faster than the host path on TPU)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..detect.align import align_directory
    from ..detect.pipeline import MTCNNDetector

    detector = (MTCNNDetector.from_npy(*args.det_weights)
                if args.det_weights else MTCNNDetector())
    if args.export_native_mtcnn:
        from ..serve.export import export_mtcnn

        export_mtcnn(args.export_native_mtcnn, detector.pnet_params,
                     detector.rnet_params, detector.onet_params)
        print(f"native MTCNN export: {args.export_native_mtcnn}")
    res = align_directory(
        args.input_dir, args.output_dir, detector,
        image_size=args.image_size, margin=args.margin,
        minsize=args.minsize, thresholds=tuple(args.thresholds),
        factor=args.factor, detect_multiple=args.detect_multiple_faces,
        device_cascade=args.device_cascade)
    print(f"Total number of images: {res.total}")
    print(f"Number of successfully aligned images: {res.aligned}")
    return res


if __name__ == "__main__":
    main()
