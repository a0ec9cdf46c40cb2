"""Export the fused recognition pipeline as a deployable StableHLO artifact.

The reference deploys symbol JSON + params that a serving process loads
without any training code (Feature.hpp:163-205). The TPU-era equivalent:
serialize the WHOLE fused detect -> crop -> embed -> gallery-match program
(serve/pipeline.py) via jax.export; a serving process calls
``serve.aot.load_pipeline(artifact)`` — no model code, no weights files
(parameters are baked into the program; the gallery is baked too by
default, or shipped as a runtime argument with --dynamic-gallery-rows so
the identity DB can grow without re-exporting).

  fx.export_aot --export-dir runs/bb/export --gallery gal.npz \\
      --frame-size 480 640 --out deploy/pipe.shlo [--max-faces 8]
  fx.export_aot --export-dir runs/bb/export --dynamic-gallery-rows 100000 \\
      --frame-size 480 640 --out deploy/pipe.shlo
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--export-dir", required=True,
                   help="trained model export (serve/export.py layout)")
    p.add_argument("--gallery",
                   help=".npz feature store: the enrolled gallery to bake "
                        "(required unless --dynamic-gallery-rows)")
    p.add_argument("--dynamic-gallery-rows", type=int, default=0,
                   metavar="G",
                   help="export with the gallery as a RUNTIME argument of "
                        "shape [G, feature_dim] instead of baking it: one "
                        "artifact serves every state of the identity DB "
                        "(enroll without re-export). Call the loaded "
                        "artifact as fn(frame, gallery_n, rows) with "
                        "serve.pipeline.normalize_gallery's output and the "
                        "enrolled-row count — rows beyond it are masked "
                        "out of the match, so padding contents are inert")
    from ._common import GALLERY_DTYPE_NAMES

    p.add_argument("--gallery-dtype", choices=GALLERY_DTYPE_NAMES,
                   default="f32",
                   help="with --dynamic-gallery-rows: storage dtype of the "
                        "gallery operand. The match stage at production "
                        "scale is bandwidth-bound, so bf16 halves and int8 "
                        "quarters its HBM bytes (int8: ~2e-3 cosine error; "
                        "pass normalize_gallery(g, <dtype>) at call time)")
    p.add_argument("--frame-size", type=int, nargs=2, required=True,
                   metavar=("H", "W"))
    p.add_argument("--out", required=True, help="artifact path (.shlo)")
    p.add_argument("--embed-size", type=int, default=0,
                   help="face-crop size fed to the embedder (default: the "
                        "export manifest's input height)")
    p.add_argument("--streams", type=int, default=0,
                   help="export the MULTISTREAM pipeline at a fixed "
                        "stream count: the artifact's frame argument "
                        "becomes [N, H, W, 3] (one vmapped dispatch "
                        "identifies every camera; one artifact per "
                        "deployed N). Composes with "
                        "--dynamic-gallery-rows for the production "
                        "serving config: N streams against a runtime "
                        "DeviceGallery with zero model code in-process")
    p.add_argument("--max-faces", type=int, default=1,
                   help=">1 exports the multi-face pipeline")
    p.add_argument("--minsize", type=int, default=20)
    p.add_argument("--thresholds", type=float, nargs=3,
                   default=(0.6, 0.7, 0.7))
    p.add_argument("--sim-threshold", type=float, default=0.5)
    p.add_argument("--det-weights", nargs=3,
                   metavar=("DET1", "DET2", "DET3"),
                   help="MTCNN det*.npy files (converted-Caffe layout)")
    p.add_argument("--mtcnn-npz",
                   help="detector weights in this repo's export_mtcnn "
                        "layout (fx.align --export-native-mtcnn writes it)")
    p.add_argument("--precision", choices=("manifest", "bf16", "f32"),
                   default="manifest",
                   help="embedder compute precision baked into the artifact. "
                        "'manifest' (default) reads the export manifest's "
                        "'precision' field (written by fx.train_backbone) so "
                        "an f32-trained model serves in f32; manifests "
                        "without the field fall back to bf16 (the historic "
                        "behavior)")
    p.add_argument("--int8-embed", action="store_true",
                   help="bake the int8 MXU path for the embed stage "
                        "(ops/quantized.py interceptor) into the artifact; "
                        "measured 0.96x on the detector-dominated pipeline "
                        "— useful only when the embed stage dominates "
                        "(large crops / many faces)")
    p.add_argument("--compiled-out",
                   help="ALSO write a ready-to-run PJRT executable "
                        "artifact (serve/aot.py::export_compiled) at this "
                        "path: the XLA compile happens NOW on the current "
                        "backend, so a serving process's first dispatch "
                        "is transfer+execute (single-digit-second cold "
                        "start). Pinned to this platform — export on the "
                        "deploy hardware")
    p.add_argument("--cache-bundle", action="store_true",
                   help="after export, compile the artifact ONCE in a "
                        "fresh subprocess and ship the persistent "
                        "compilation-cache entries as <out>.xcache/ — a "
                        "serving machine's first dispatch becomes a cache "
                        "hit (single-digit-second cold start) instead of a "
                        "full XLA compile. Prime on hardware matching the "
                        "deploy target")
    p.add_argument("--platforms", nargs="+",
                   help="lowering platforms baked into the artifact, e.g. "
                        "'tpu' or 'cpu tpu' (default: the CURRENT backend "
                        "only — export on a CPU box without this flag and "
                        "the artifact will refuse to run on TPU)")
    return p


def _detector_from_mtcnn_npz(path):
    """Rebuild MTCNNDetector params from an export_mtcnn .npz
    (keys {pnet|rnet|onet}/{layer}/{param})."""
    import numpy as np

    from ..detect.pipeline import MTCNNDetector

    nets = {"pnet": {}, "rnet": {}, "onet": {}}
    with np.load(path) as z:
        for key in z.files:
            net, layer, param = key.split("/", 2)
            nets[net].setdefault(layer, {})[param] = z[key]
    return MTCNNDetector(nets["pnet"], nets["rnet"], nets["onet"])


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np

    from ..data import load_feature_store
    from ..detect.pipeline import MTCNNDetector
    from ..serve.aot import export_pipeline
    from ..serve.export import load_exported_params
    from ..serve.pipeline import (make_multiface_pipeline,
                                  make_recognition_pipeline)
    from .train_backbone import _model_by_name

    if not args.gallery and not args.dynamic_gallery_rows:
        raise SystemExit(
            "one of --gallery (baked) or --dynamic-gallery-rows (runtime "
            "argument) is required")
    if args.gallery and args.dynamic_gallery_rows:
        raise SystemExit(
            "--gallery and --dynamic-gallery-rows are mutually exclusive: "
            "a dynamic artifact takes the gallery at CALL time, so the "
            ".npz would be silently ignored")
    if args.dynamic_gallery_rows < 0:
        raise SystemExit("--dynamic-gallery-rows must be a positive row "
                         "count")
    if args.gallery_dtype != "f32" and not args.dynamic_gallery_rows:
        raise SystemExit("--gallery-dtype applies to the dynamic gallery "
                         "operand (use with --dynamic-gallery-rows); a "
                         "baked gallery is an f32 program constant")
    params, batch_stats, manifest = load_exported_params(args.export_dir)
    head = params.get("fc2") or params.get("f8")
    num_classes = int(head["kernel"].shape[1]) if head else 1000
    if args.precision == "manifest":
        bf16 = manifest.get("precision", "bf16") == "bf16"
    else:
        bf16 = args.precision == "bf16"
    model = _model_by_name(manifest["model"], num_classes, bf16=bf16)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    dynamic = bool(args.dynamic_gallery_rows)
    if dynamic:
        gallery = None
        gallery_shape = (args.dynamic_gallery_rows,
                         int(manifest["feature_dim"]))
    else:
        gallery, _ = load_feature_store(args.gallery)
        gallery_shape = None
    if args.det_weights:
        detector = MTCNNDetector.from_npy(*args.det_weights)
    elif args.mtcnn_npz:
        detector = _detector_from_mtcnn_npz(args.mtcnn_npz)
    else:
        detector = MTCNNDetector()
        print("WARNING: no --det-weights/--mtcnn-npz — a RANDOM-INIT "
              "detector is being baked into the artifact (demo only; "
              "re-export with real weights before deploying)")
    embed_size = args.embed_size or int(manifest["input"]["height"])

    fh, fw = args.frame_size
    kw = dict(frame_h=fh, frame_w=fw, embed_size=embed_size,
              minsize=args.minsize, thresholds=tuple(args.thresholds),
              sim_threshold=args.sim_threshold,
              int8_embed=args.int8_embed, dynamic_gallery=dynamic)
    gal_arg = None if dynamic else np.asarray(gallery, np.float32)
    if args.streams > 0:
        from ..serve.pipeline import make_multistream_pipeline

        if args.max_faces > 1:
            kw["max_faces"] = args.max_faces
        pipe = make_multistream_pipeline(detector, model, variables,
                                         gal_arg, **kw)
    else:
        maker = (make_recognition_pipeline if args.max_faces <= 1
                 else make_multiface_pipeline)
        if args.max_faces > 1:
            kw["max_faces"] = args.max_faces
        pipe = maker(detector, model, variables, gal_arg, **kw)
    from ._common import gallery_dtype

    gdtype = gallery_dtype(args.gallery_dtype)
    path = export_pipeline(args.out, pipe, fh, fw,
                           streams=args.streams,
                           gallery_shape=gallery_shape,
                           gallery_dtype=gdtype,
                           platforms=args.platforms)
    if args.cache_bundle:
        import os as _os

        from ..serve.aot import prime_cache_bundle

        bundle = prime_cache_bundle(path)
        print(f"cache bundle: {bundle} ({len(_os.listdir(bundle))} "
              f"entries) — serving cold start is now a cache hit on "
              f"matching hardware")
    if args.compiled_out:
        from ..serve.aot import export_compiled

        cpath = export_compiled(args.compiled_out, pipe, fh, fw,
                                streams=args.streams,
                                gallery_shape=gallery_shape,
                                gallery_dtype=gdtype)
        import os as _os
        print(f"compiled executable: {cpath} "
              f"({_os.path.getsize(cpath) / 1e6:.1f} MB, platform-pinned)")
    import os

    import json

    with open(path + ".json") as f:
        platforms = json.load(f)["platforms"]
    gal_desc = (f"dynamic gallery [{gallery_shape[0]}, {gallery_shape[1]}] "
                f"runtime arg" if dynamic
                else f"{gallery.shape[0]}-row gallery baked")
    print(f"AOT artifact: {path} "
          f"({os.path.getsize(path) / 1e6:.1f} MB, "
          f"{gal_desc}, "
          f"{'%d-stream' % args.streams if args.streams else '1-stream'}, "
          f"{'multi-face K=%d' % args.max_faces if args.max_faces > 1 else 'single-face'}, "
          f"platforms={platforms})")
    return path


if __name__ == "__main__":
    main()
