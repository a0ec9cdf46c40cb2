"""Native (no-TPU) serving forward latency: f32 AVX2 GEMM vs int8 qgemm.

Times single-frame extraction through cpp/include/facejax/efmnet.hpp from a
real export artifact (default: the TPU-trained demo backbone) and reports
the embedding cosine between the two paths — the accuracy cost of int8 must
ride along with its speedup. Usage:

    python tools/perf_native.py [export_dir] [--frames N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from improving_face_recognition_performance_using_triplet_loss_tpu.serve.native import (  # noqa: E402
    NativeEmbedder,
    build_native,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("export_dir", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()

    if args.export_dir is None:
        # artifacts/ keeps manifests only; synthesize a random-init export
        # (latency is weight-value-independent, and the cosine check is
        # hardest on random weights — no trained redundancy to hide noise)
        import tempfile

        import jax
        import numpy as np_

        from improving_face_recognition_performance_using_triplet_loss_tpu.models import (  # noqa: E501
            EFMNet342,
        )
        from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (  # noqa: E501
            export_params,
        )

        model = EFMNet342(num_classes=10)
        variables = model.init(jax.random.PRNGKey(0),
                               np_.zeros((1, 64, 64, 1), np_.float32))
        args.export_dir = os.path.join(tempfile.mkdtemp("fx_perf"), "export")
        export_params(args.export_dir, variables["params"],
                      model_name="efmnet342", feature_dim=342,
                      input_hw=(64, 64), input_channels=1)

    build_native(force=False)
    rng = np.random.default_rng(0)
    mani_hw = (64, 64)
    f32 = NativeEmbedder(args.export_dir)
    if f32.manifest:
        mani_hw = (f32.manifest["input"]["height"],
                   f32.manifest["input"]["width"])
    frames = rng.random((args.frames, *mani_hw)).astype(np.float32)

    def run(emb):
        emb.extract(frames[0])  # warm (page-in + thread-pool spin-up;
        # quantization happens eagerly in the NativeNet constructor)
        t0 = time.perf_counter()
        feats = [emb.extract(f) for f in frames]
        dt = (time.perf_counter() - t0) / len(frames)
        return dt * 1e3, np.stack(feats)

    ms_f32, feat_f32 = run(f32)
    q = NativeEmbedder(args.export_dir, quantized=True)
    ms_q, feat_q = run(q)

    cos = np.sum(feat_f32 * feat_q, axis=1) / (
        np.linalg.norm(feat_f32, axis=1) * np.linalg.norm(feat_q, axis=1))
    print(f"export: {args.export_dir} ({f32.model}, {mani_hw[0]}x{mani_hw[1]})")
    print(f"f32  AVX2 GEMM : {ms_f32:7.1f} ms/frame")
    print(f"int8 qgemm     : {ms_q:7.1f} ms/frame  ({ms_f32 / ms_q:.2f}x)")
    print(f"embedding cosine int8 vs f32: min {cos.min():.6f} "
          f"mean {cos.mean():.6f}")
    f32.close()
    q.close()


if __name__ == "__main__":
    main()
