"""Triplet-head training over precomputed features.

Reference parity: pre-trained_efm_v3.py — CSVIter over 342-d feature rows,
Dense(128, no bias) head, TripletLoss(margin 0.5), SGD(2.4e-4, wd 1e-5),
300 epochs, cosine pos/neg similarities appended to cosine_similarity.csv
every batch, params saved per epoch. Defaults mirror those knobs
(pre-trained_efm_v3.py:131-132,174-189).

Improvements over the reference (documented deviations): device-side mining
(no per-row host sync), optional semi-hard mining (BASELINE.json
north-star), shard_map data parallelism over all visible devices, orbax
checkpointing with resume.

Example (synthetic smoke run):
  python -m ...cli.train_head --synthetic --epochs 3 --batch-size 256 --out-dir /tmp/head
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features", help=".npz feature store (features+labels)")
    p.add_argument("--train-img-csv", help="reference-format train_img.csv")
    p.add_argument("--train-id-csv", help="reference-format train_id.csv")
    p.add_argument("--test-features", help="optional eval .npz store")
    p.add_argument("--synthetic", action="store_true",
                   help="run on synthetic clustered features")
    p.add_argument("--out-dir", default="runs/train_head")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=16384)
    p.add_argument("--embedding-dim", type=int, default=128)
    p.add_argument("--margin", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=2.4e-4)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--mining", default="random",
                   choices=["random", "semi_hard", "semi_hard_fused", "hard"])
    p.add_argument("--normalize-embeddings", action="store_true",
                   help="FaceNet-style triplet on L2-normalized head outputs "
                        "(better generalization; reference uses raw outputs)")
    p.add_argument("--export-projector", action="store_true",
                   help="write before/after embedding-projector TSVs "
                        "(the reference's TB projector visual, C13)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard_map over all visible devices")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="parameter EMA; the export uses the averaged "
                        "weights (facenet.py:168-211)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p


def load_features(args):
    from ..data import load_feature_store, read_feature_csv, read_labels_csv
    from ..data.synthetic import synthetic_features

    if args.synthetic:
        return synthetic_features(num_ids=256, per_id=16, dim=342,
                                  seed=args.seed)
    if args.features:
        return load_feature_store(args.features)
    if args.train_img_csv and args.train_id_csv:
        return (read_feature_csv(args.train_img_csv),
                read_labels_csv(args.train_id_csv).astype(np.int64))
    raise SystemExit("provide --features, --train-img-csv/--train-id-csv, "
                     "or --synthetic")


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import setup_logging, log_config
    from ..data import PairBatcher, load_feature_store
    from ..eval.cosine import CosineSimilaritySink
    from ..models.heads import LinearHead
    from ..parallel import make_mesh
    from ..train import (
        Checkpointer, HEAD_METRIC_KEYS, create_train_state,
        make_head_eval_step, make_head_train_step, resume_if_available,
        sgd_wd, shard_map_step, train_loop, PreemptionGuard,
    )

    log = setup_logging(os.path.join(args.out_dir, "log"), "train_head")
    log_config(log, args)

    feats, labels = load_features(args)
    batch = min(args.batch_size, feats.shape[0])
    log.info("features: %s, %d identities", feats.shape,
             len(np.unique(labels)))

    model = LinearHead(out_dim=args.embedding_dim)
    tx = sgd_wd(lr=args.lr, weight_decay=args.weight_decay)
    if args.ema_decay > 0:
        from ..train import with_param_ema

        tx = with_param_ema(tx, decay=args.ema_decay)
    state = create_train_state(model, tx, jax.random.PRNGKey(args.seed),
                               feats[:1])

    axis = "data" if args.data_parallel else None
    train_step = make_head_train_step(
        model, tx, margin=args.margin, mining_mode=args.mining,
        axis_name=axis, normalize_embeddings=args.normalize_embeddings)
    eval_step = make_head_eval_step(model, margin=args.margin,
                                    mining_mode=args.mining, axis_name=axis)
    if args.data_parallel:
        mesh = make_mesh()
        train_step = shard_map_step(train_step, mesh, has_state_out=True,
                                    metric_keys=HEAD_METRIC_KEYS)
        eval_step = shard_map_step(eval_step, mesh, has_state_out=False,
                                   metric_keys=HEAD_METRIC_KEYS)
    else:
        train_step = jax.jit(train_step)
        eval_step = jax.jit(eval_step)

    ckpt = Checkpointer(os.path.join(args.out_dir, "ckpt"))
    start_epoch = 0
    if args.resume:
        state, start_epoch = resume_if_available(ckpt, state)
        log.info("resumed at epoch %d", start_epoch)

    batcher = PairBatcher(feats, labels, batch, shuffle=True, seed=args.seed)
    eval_batches = None
    if args.test_features:
        ef, el = load_feature_store(args.test_features)
        eb = PairBatcher(ef, el, min(batch, ef.shape[0]), shuffle=False)
        eval_batches = lambda: iter(eb)

    sink = CosineSimilaritySink(
        os.path.join(args.out_dir, "cosine_similarity.csv"))
    with PreemptionGuard() as guard:
        state, history = train_loop(
            state, train_step, lambda: iter(batcher),
            epochs=args.epochs, eval_step=eval_step if eval_batches else None,
            eval_batches=eval_batches, sink=sink, checkpointer=ckpt,
            start_epoch=start_epoch, preemption_guard=guard)
    sink.flush()

    if args.export_projector:
        import jax.numpy as jnp

        from ..eval.projector import export_projector

        head_out = np.asarray(model.apply({"params": state.params},
                                          jnp.asarray(feats)))
        export_projector(feats, labels,
                         os.path.join(args.out_dir, "projector_before"))
        export_projector(head_out, labels,
                         os.path.join(args.out_dir, "projector_after"))
        log.info("projector TSVs written (before/after triplet)")

    from ..serve.export import export_params
    export_weights = state.params
    if args.ema_decay > 0:
        from ..train import get_ema_params

        export_weights = get_ema_params(state.opt_state)
        log.info("export uses EMA weights (decay %.4f)", args.ema_decay)
    export_params(os.path.join(args.out_dir, "export"), export_weights,
                  model_name="linear_head", feature_dim=args.embedding_dim,
                  input_hw=(1, feats.shape[1]), input_channels=1)
    log.info("done; final train loss %g",
             history[-1].train["loss"] if history else float("nan"))
    return state, history


if __name__ == "__main__":
    main()
