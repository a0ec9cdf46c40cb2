"""Frozen-backbone + trainable 342-d projection training.

Reference parity: final_efm.py — load the pretrained EFM backbone, freeze
it, L2-normalize its 342-d features per row (final_efm.py:239-243), train a
bias-free Dense(342) head with TripletLoss(margin 0.2) and SGD(2.4e-4,
wd 1e-5) for 100 epochs, logging the frozen backbone's ID accuracy alongside
(final_efm.py:203-319).

Note on the joint loss: the reference *intends*
``loss = id_loss + alpha*TL`` (final_efm.py:261 references undefined
``alpha``/``TL_loss`` — SURVEY.md §2.3), but the ID softmax lives entirely in
the frozen backbone, so no gradient reaches the trainable head from it. The
head is therefore trained on the triplet term; id_loss/acc are reported as
metrics. This matches the only gradient flow the reference could ever have.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", help="train .npz image store")
    p.add_argument("--eval-images")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--export-dir", help="frozen backbone export; random init "
                                        "if omitted")
    p.add_argument("--model", default="efmnet342",
                   choices=["lightcnn29", "efmnet342", "lightcnn9"])
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--out-dir", default="runs/train_final")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=40)
    p.add_argument("--head-dim", type=int, default=342)
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--lr", type=float, default=2.4e-4)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--mining", default="random",
                   choices=["random", "semi_hard", "semi_hard_fused", "hard"])
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="parameter EMA decay for the head (0 disables); "
                        "export uses the averaged weights "
                        "(facenet.py:195-199 semantics)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from ._common import setup_logging, log_config
    from .train_backbone import _load_images, _model_by_name
    from ..data import PairBatcher
    from ..eval.cosine import CosineSimilaritySink
    from ..extract import make_extract_fn
    from ..models.heads import LinearHead
    from ..serve.export import export_params, load_exported_params
    from ..train import (Checkpointer, create_train_state,
                         make_head_train_step, sgd_wd, train_loop)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    log = setup_logging(os.path.join(args.out_dir, "log"), "train_final")
    log_config(log, args)

    images, labels, _ = _load_images(args)
    if images.dtype == np.uint8:  # mmap stores load raw uint8
        images = np.asarray(images, np.float32) / 255.0
    batch = min(args.batch_size, images.shape[0])

    # frozen backbone
    if args.export_dir:
        params, batch_stats, manifest = load_exported_params(args.export_dir)
        backbone = _model_by_name(manifest.get("model", args.model),
                                  args.num_classes, args.bf16)
        bvars = {"params": params}
        if batch_stats:
            bvars["batch_stats"] = batch_stats
    else:
        backbone = _model_by_name(args.model, args.num_classes, args.bf16)
        bvars = backbone.init(jax.random.PRNGKey(1), images[:1])
        log.warning("no --export-dir: frozen backbone is randomly initialized")
    extract = make_extract_fn(backbone, normalize=True)  # L2 per row

    head = LinearHead(out_dim=args.head_dim)
    tx = sgd_wd(lr=args.lr, weight_decay=args.weight_decay)
    if args.ema_decay > 0:
        from ..train import with_param_ema

        tx = with_param_ema(tx, decay=args.ema_decay)
    feat_dim = backbone.feature_dim
    state = create_train_state(head, tx, jax.random.PRNGKey(args.seed),
                               np.zeros((1, feat_dim), np.float32))
    head_step = jax.jit(make_head_train_step(head, tx, margin=args.margin,
                                             mining_mode=args.mining))

    class _FeatureBatches:
        """Run the frozen backbone per batch, yield normalized features."""

        def __init__(self, batcher):
            self.batcher = batcher

        def __iter__(self):
            for anc, pos, lab in self.batcher:
                _, fa = extract(bvars, anc)
                _, fp = extract(bvars, pos)
                yield np.asarray(fa), np.asarray(fp), lab

    batcher = PairBatcher(images, labels, batch, shuffle=True, seed=args.seed)
    fb = _FeatureBatches(batcher)

    ckpt = Checkpointer(os.path.join(args.out_dir, "ckpt"))
    sink = CosineSimilaritySink(
        os.path.join(args.out_dir, "cosine_similarity.csv"))
    state, history = train_loop(
        state, head_step, lambda: iter(fb), epochs=args.epochs, sink=sink,
        checkpointer=ckpt)
    sink.flush()
    export_weights = state.params
    if args.ema_decay > 0:
        from ..train import get_ema_params

        export_weights = get_ema_params(state.opt_state)
        log.info("export uses EMA weights (decay %.4f)", args.ema_decay)
    export_params(os.path.join(args.out_dir, "export"), export_weights,
                  model_name="linear_head", feature_dim=args.head_dim,
                  input_hw=(1, feat_dim), input_channels=1)
    log.info("done")
    return state, history


if __name__ == "__main__":
    main()
