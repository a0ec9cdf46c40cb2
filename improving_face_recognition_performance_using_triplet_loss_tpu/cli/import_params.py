"""Import a reference MXNet checkpoint into a standard export.

Both reference training artifacts import (auto-detected by key layout):
- ``EFM_RES.json`` + ``.params`` — the symbol checkpoint the extraction and
  C++ serving stack consume (extract_feacture_v2.py:45-51,
  Feature.hpp:213-219) -> EFMNet342 export.
- ``efm_res-NNNN.params`` from train_efm.py:289 — the gluon LightCNN_29
  ``save_parameters`` file (structural dot names; its shared res convs are
  expanded into the standard distinct-weights tree, an identical forward)
  -> LightCNN29 export incl. the BatchNorm running stats.

Reads the ``.params`` binary without mxnet and writes the framework's
export artifact — after which every downstream surface works on the
imported model: ``extract_features --export-dir``, ``lfw_run``,
``serve_demo``, ``identify --native-export`` (the C++ runtime included).

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
    from ..utils.mxnet_import import (expand_shared_res, infer_input_size,
                                      is_gluon_lightcnn29,
                                      map_efm_params,
                                      map_gluon_lightcnn29,
                                      read_mxnet_params,
                                      validate_symbol_json)

    if args.symbol:
        validate_symbol_json(args.symbol)
        print(f"symbol graph validated: {args.symbol}")
    mx_args, mx_aux = read_mxnet_params(args.params)
    print(f"read {len(mx_args)} arg + {len(mx_aux)} aux arrays")
    batch_stats = None
    if is_gluon_lightcnn29(mx_args):
        params, batch_stats = map_gluon_lightcnn29(mx_args, mx_aux)
        params = expand_shared_res(params)
        merged = dict(mx_args)
        merged.update(mx_aux)
        hw = merged["conv_net.15.weight"].shape[1] // 174
        size = int(round(hw ** 0.5)) * 32
        num_classes = int(merged["fc2.1.weight"].shape[0])
        model_name, feature_dim = "lightcnn29", 684
        print(f"gluon LightCNN_29 checkpoint: input {size}x{size} "
              f"grayscale, {num_classes} classes, 684-d feature "
              f"(shared res convs expanded)")
    else:
        params = map_efm_params(mx_args)
        size = infer_input_size(mx_args)
        num_classes = int(mx_args["fc2_weight"].shape[0])
        model_name, feature_dim = "efmnet342", 342
        print(f"EFM symbol checkpoint: input {size}x{size} grayscale, "
              f"{num_classes} classes, 342-d feature")

    if args.verify:
        import jax

        from ..models import EFMNet342, LightCNN29

        model = (LightCNN29(num_classes=num_classes)
                 if model_name == "lightcnn29"
                 else EFMNet342(num_classes=num_classes))
        ref = model.init(jax.random.PRNGKey(0),
                         np.zeros((1, size, size, 1), np.float32))["params"]
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
        got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        if ref_shapes != got_shapes:
            raise SystemExit(f"imported tree shape mismatch:\n"
                             f"expected {ref_shapes}\ngot {got_shapes}")
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, feat = model.apply(variables,
                                   np.zeros((1, size, size, 1), np.float32),
                                   train=False)
        print(f"verify: forward OK, logits {logits.shape}, "
              f"feature {feat.shape}")

    export_params(args.out_dir, params, model_name=model_name,
                  feature_dim=feature_dim, input_hw=(size, size),
                  input_channels=1, batch_stats=batch_stats,
                  extra={"imported_from": "mxnet_params"})
    print(f"export written: {args.out_dir}")
    return params


if __name__ == "__main__":
    main()
