"""Import a reference MXNet checkpoint into a standard export.

The reference's trained artifact is ``EFM_RES.json`` + ``EFM_RES-XXXX.params``
(extract_feacture_v2.py:45-51, Feature.hpp:213-219). This command reads the
``.params`` binary without mxnet, maps the EFM-symbol weights onto the flax
EFMNet342 tree (utils/mxnet_import.py), and writes the framework's export
artifact — after which every downstream surface works on the imported
model: ``extract_features --export-dir``, ``lfw_run``, ``serve_demo``,
``identify --native-export`` (the C++ runtime included).

  fx.import_params EFM_RES-0280.params --out-dir runs/imported/export
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("params", help="MXNet .params file (EFM symbol layout)")
    p.add_argument("--out-dir", required=True,
                   help="export directory to write (weights.npz + manifest)")
    p.add_argument("--symbol", help="optional EFM_RES.json: cross-check "
                                    "the graph against the expected "
                                    "EFM-symbol architecture before "
                                    "importing")
    p.add_argument("--verify", action="store_true",
                   help="after import, run one forward through the flax "
                        "model to validate shapes end-to-end")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np

    from ..serve.export import export_params
    from ..utils.mxnet_import import (infer_input_size, map_efm_params,
                                      read_mxnet_params,
                                      validate_symbol_json)

    if args.symbol:
        validate_symbol_json(args.symbol)
        print(f"symbol graph validated: {args.symbol}")
    mx_args, mx_aux = read_mxnet_params(args.params)
    print(f"read {len(mx_args)} arg + {len(mx_aux)} aux arrays")
    params = map_efm_params(mx_args)
    size = infer_input_size(mx_args)
    num_classes = int(mx_args["fc2_weight"].shape[0])
    print(f"EFM symbol checkpoint: input {size}x{size} grayscale, "
          f"{num_classes} classes, 342-d feature")

    if args.verify:
        import jax

        from ..models import EFMNet342

        model = EFMNet342(num_classes=num_classes)
        ref = model.init(jax.random.PRNGKey(0),
                         np.zeros((1, size, size, 1), np.float32))["params"]
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
        got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        if ref_shapes != got_shapes:
            raise SystemExit(f"imported tree shape mismatch:\n"
                             f"expected {ref_shapes}\ngot {got_shapes}")
        logits, feat = model.apply({"params": params},
                                   np.zeros((1, size, size, 1), np.float32),
                                   train=False)
        print(f"verify: forward OK, logits {logits.shape}, "
              f"feature {feat.shape}")

    export_params(args.out_dir, params, model_name="efmnet342",
                  feature_dim=342, input_hw=(size, size), input_channels=1,
                  extra={"imported_from": "mxnet_params"})
    print(f"export written: {args.out_dir}")
    return params


if __name__ == "__main__":
    main()
