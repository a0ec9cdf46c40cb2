"""Joint softmax + triplet backbone training.

Reference parity: train_efm.py — LightCNN-29 from scratch at 1x128x128,
batch 64, Adam(2.4e-4) with factor decay 0.88 every 6 epochs (wd 1e-5),
TripletLoss(margin 0.2) weighted by alpha 0.1 against the ID softmax CE,
random in-batch negatives, per-epoch checkpoints, cosine similarities
appended every batch (train_efm.py:154-157, 200-214, 221-294).

TPU-first deltas (documented deviations): the whole step is one XLA program
(mining included), rand-mirror augmentation runs on host numpy views (crop
is a no-op at packed size), data parallelism via shard_map when requested,
and the (broken) ``mx.nd.nrom`` global-norm normalization of the reference
is per-row L2 as intended (SURVEY.md §2.3).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", help=".npz image store (images+labels), or a "
                                    "directory = streaming mmap store "
                                    "(pack_dataset --mmap)")
    p.add_argument("--shuffle-window", type=int, default=65536,
                   help="two-level shuffle window for the mmap store loader")
    p.add_argument("--eval-images", help="optional eval .npz image store")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-size", type=int, default=64)
    p.add_argument("--synthetic-channels", type=int, default=0,
                   help="0 = per-model default (3 for deepface, else 1)")
    p.add_argument("--model", default="lightcnn29",
                   choices=["lightcnn29", "efmnet342", "lightcnn9",
                            "deepface"])
    p.add_argument("--out-dir", default="runs/train_backbone")
    p.add_argument("--epochs", type=int, default=280)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2.4e-4)
    p.add_argument("--lr-factor", type=float, default=0.88)
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "adagrad", "adadelta", "rmsprop", "mom",
                            "sgd"],
                   help="facenet.py:168-184 optimizer family on the "
                        "reference's factor schedule (adam = reference "
                        "default, train_efm.py:212-213)")
    p.add_argument("--lr-decay-epochs", type=int, default=6)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--center-loss-weight", type=float, default=0.0,
                   help="add center loss on anchor embeddings "
                        "(facenet.py:64-77 capability)")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="track a parameter EMA at this decay; the EXPORT "
                        "uses the averaged weights (facenet's "
                        "ExponentialMovingAverage, facenet.py:168-211)")
    p.add_argument("--mining", default="random",
                   choices=["random", "semi_hard", "semi_hard_fused", "hard"])
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32)")
    p.add_argument("--no-mirror", action="store_true")
    p.add_argument("--device-augment", action="store_true",
                   help="fuse rand-mirror into the jitted step instead of "
                        "host numpy")
    p.add_argument("--crop-size", type=int,
                   help="rand_crop parity (train_efm.py:179): pack images "
                        "LARGER (e.g. 144) and random-crop to this size on "
                        "device every step (eval center-crops)")
    p.add_argument("--prefetch", type=int, default=0,
                   help="prefetch N batches to device ahead of compute")
    p.add_argument("--scan-chunk", type=int, default=0, metavar="K",
                   help="chain K train steps per device dispatch via "
                        "lax.scan — state never leaves HBM between them "
                        "(8x on link-attached chips; single-device path)")
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--class-parallel", type=int, default=0, metavar="M",
                   help="shard the ID-softmax head over M mesh devices "
                        "(class-parallel softmax for Celeb1M's 78k "
                        "identities; combines with data parallelism as a "
                        "2-D data x model mesh)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint-every", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    return p


def _model_by_name(name, num_classes, bf16):
    import jax.numpy as jnp
    from ..models import DeepFace, EFMNet342, LightCNN29, LightCNN9

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    cls = {"lightcnn29": LightCNN29, "efmnet342": EFMNet342,
           "lightcnn9": LightCNN9, "deepface": DeepFace}[name]
    return cls(num_classes=num_classes, dtype=dtype)


def _load_images(args):
    """Returns (images, labels, is_mmap). mmap stores stay uint8 memmaps —
    batches normalize on device inside the jitted step."""
    from ..data.records import load_image_store, load_image_store_mmap
    from ..data.synthetic import synthetic_faces

    if args.synthetic:
        # DeepFace is the RGB 152x152 pipeline (paper canonical input;
        # README.md:8,15) — its synthetic stand-in defaults to 3-channel
        # and respects its >=65px VALID-conv floor. getattr: other CLIs
        # (train_began/train_final) share this loader with smaller parsers.
        model = getattr(args, "model", "")
        channels = getattr(args, "synthetic_channels", 0) or (
            3 if model == "deepface" else 1)
        size = args.synthetic_size
        if model == "deepface" and size < 65:
            size = 72
        images, labels = synthetic_faces(
            num_ids=16, per_id=16, size=size, channels=channels,
            seed=args.seed)
        return images, labels, False
    if args.images:
        if os.path.isdir(args.images):
            images, labels = load_image_store_mmap(args.images)
            return images, labels, True
        images, labels = load_image_store(args.images)
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        return images, labels, False
    raise SystemExit("provide --images or --synthetic")


class _MirrorBatches:
    """Host-side rand_mirror augmentation over a PairBatcher
    (ImageRecordIter rand_mirror=True, train_efm.py:179)."""

    def __init__(self, batcher, enabled: bool, seed: int):
        self.batcher = batcher
        self.enabled = enabled
        self.rng = np.random.default_rng(seed + 101)

    def __iter__(self):
        for anc, pos, lab in self.batcher:
            if self.enabled:
                flip = self.rng.random(anc.shape[0]) < 0.5
                anc = np.where(flip[:, None, None, None], anc[:, :, ::-1, :],
                               anc)
                flip = self.rng.random(pos.shape[0]) < 0.5
                pos = np.where(flip[:, None, None, None], pos[:, :, ::-1, :],
                               pos)
            yield anc, pos, lab


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ._common import setup_logging, log_config
    from ..data import PairBatcher
    from ..eval.cosine import CosineSimilaritySink
    from ..parallel import make_mesh
    from ..train import (
        Checkpointer, backbone_optimizer, create_train_state,
        make_backbone_eval_step, make_backbone_train_step,
        resume_if_available, shard_map_step, train_loop, PreemptionGuard,
    )
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    log = setup_logging(os.path.join(args.out_dir, "log"), "train_backbone")
    log_config(log, args)

    images, labels, is_mmap = _load_images(args)
    num_classes = int(labels.max()) + 1
    batch = min(args.batch_size, images.shape[0])
    steps_per_epoch = max(images.shape[0] // batch, 1)
    log.info("images %s%s, %d classes, %d steps/epoch", images.shape,
             " [mmap]" if is_mmap else "", num_classes, steps_per_epoch)

    model = _model_by_name(args.model, num_classes, args.bf16)
    tx = backbone_optimizer(
        args.optimizer, base_lr=args.lr,
        decay_every_steps=steps_per_epoch * args.lr_decay_epochs,
        factor=args.lr_factor, weight_decay=args.weight_decay)
    if args.ema_decay > 0:
        from ..train import with_param_ema

        tx = with_param_ema(tx, decay=args.ema_decay)
    import jax.numpy as jnp
    aux = (jnp.zeros((num_classes, model.feature_dim), jnp.float32)
           if args.center_loss_weight > 0 else None)
    init_sample = np.asarray(images[:1])
    if init_sample.dtype == np.uint8:
        init_sample = init_sample.astype(np.float32) / 255.0
    if args.crop_size:
        if args.crop_size > images.shape[1]:
            raise SystemExit(
                f"--crop-size {args.crop_size} exceeds packed size "
                f"{images.shape[1]} — pack larger (rand_crop recipe)")
        # params are sized by the CROPPED input the model actually sees
        init_sample = init_sample[:, :args.crop_size, :args.crop_size, :]
    state = create_train_state(model, tx, jax.random.PRNGKey(args.seed),
                               init_sample, aux=aux)

    if args.class_parallel:
        if num_classes % args.class_parallel:
            raise SystemExit(
                f"--class-parallel {args.class_parallel} must divide the "
                f"class count {num_classes}")
        if args.center_loss_weight > 0:
            raise SystemExit("--center-loss-weight is incompatible with "
                             "--class-parallel")
        from ..parallel import make_2d_mesh
        from ..train import infer_class_parallel_specs, shard_map_step_2d

        mesh = make_2d_mesh(model_size=args.class_parallel)
        local_model = _model_by_name(
            args.model, num_classes // args.class_parallel, args.bf16)
        specs = infer_class_parallel_specs(state, num_classes, "model")
        cp_step = make_backbone_train_step(
            local_model, tx, margin=args.margin, alpha=args.alpha,
            mining_mode=args.mining, axis_name="data",
            class_axis_name="model",
            mirror_augment=args.device_augment and not args.no_mirror,
            crop_size=args.crop_size)
        if args.scan_chunk > 1:
            from ..train import shard_map_scanned_step_2d

            train_step = shard_map_scanned_step_2d(cp_step, mesh, specs)
        else:
            train_step = shard_map_step_2d(cp_step, mesh, specs,
                                           has_state_out=True)
        eval_step = shard_map_step_2d(
            make_backbone_eval_step(
                local_model, margin=args.margin, alpha=args.alpha,
                mining_mode=args.mining, axis_name="data",
                class_axis_name="model", crop_size=args.crop_size),
            mesh, specs, has_state_out=False)
        log.info("class-parallel softmax: %d-way head shard x %d-way data",
                 args.class_parallel,
                 jax.device_count() // args.class_parallel)
    else:
        axis = "data" if args.data_parallel else None
        train_step = make_backbone_train_step(
            model, tx, margin=args.margin, alpha=args.alpha,
            mining_mode=args.mining, axis_name=axis,
            center_weight=args.center_loss_weight,
            mirror_augment=args.device_augment and not args.no_mirror,
            crop_size=args.crop_size)
        eval_step = make_backbone_eval_step(
            model, margin=args.margin, alpha=args.alpha,
            mining_mode=args.mining, axis_name=axis,
            crop_size=args.crop_size)
        if args.data_parallel:
            mesh = make_mesh()
            if args.scan_chunk > 1:
                from ..train import shard_map_scanned_step

                train_step = shard_map_scanned_step(train_step, mesh)
            else:
                train_step = shard_map_step(train_step, mesh,
                                            has_state_out=True)
            eval_step = shard_map_step(eval_step, mesh, has_state_out=False)
        elif args.scan_chunk > 1:
            from ..train import make_scanned_step

            train_step = make_scanned_step(train_step)
            eval_step = jax.jit(eval_step)
        else:
            train_step = jax.jit(train_step)
            eval_step = jax.jit(eval_step)

    ckpt = Checkpointer(os.path.join(args.out_dir, "ckpt"))
    start_epoch = 0
    if args.resume:
        state, start_epoch = resume_if_available(ckpt, state)
        log.info("resumed at epoch %d", start_epoch)

    if is_mmap:
        # streaming shard loader: this host's contiguous row shard, windowed
        # shuffle, uint8 batches (device-normalized in the step)
        from ..data.streaming import ShardedPairBatcher

        batcher = ShardedPairBatcher(
            (images, labels), batch,
            host_id=jax.process_index(), num_hosts=jax.process_count(),
            shuffle=True, shuffle_window=args.shuffle_window, seed=args.seed)
    else:
        batcher = PairBatcher(images, labels, batch, shuffle=True,
                              seed=args.seed)
    host_mirror = not args.no_mirror and not args.device_augment
    train_batches = _MirrorBatches(batcher, host_mirror, args.seed)
    eval_batches = None
    if args.eval_images:
        from ..data.records import load_image_store
        ei, el = load_image_store(args.eval_images)
        if ei.dtype == np.uint8:
            ei = ei.astype(np.float32) / 255.0
        eb = PairBatcher(ei, el, min(batch, ei.shape[0]), shuffle=False)
        eval_batches = lambda: iter(eb)

    sink = CosineSimilaritySink(
        os.path.join(args.out_dir, "cosine_similarity.csv"))
    batch_source = (lambda: iter(train_batches))
    if args.prefetch > 0:
        from ..data.prefetch import prefetch_to_device

        batch_source = (lambda: prefetch_to_device(iter(train_batches),
                                                   size=args.prefetch))
    with PreemptionGuard() as guard:
        state, history = train_loop(
            state, train_step, batch_source,
            epochs=args.epochs,
            eval_step=eval_step if eval_batches else None,
            eval_batches=eval_batches, sink=sink, checkpointer=ckpt,
            checkpoint_every_epochs=args.checkpoint_every,
            start_epoch=start_epoch, preemption_guard=guard,
            scan_chunk=args.scan_chunk)
    sink.flush()

    from ..serve.export import export_params
    in_hw = ((args.crop_size, args.crop_size) if args.crop_size
             else images.shape[1:3])
    export_weights = state.params
    if args.ema_decay > 0:
        from ..train import get_ema_params

        export_weights = get_ema_params(state.opt_state)
        log.info("export uses EMA weights (decay %.4f)", args.ema_decay)
    export_params(
        os.path.join(args.out_dir, "export"), export_weights,
        model_name=args.model, feature_dim=model.feature_dim,
        input_hw=in_hw, input_channels=images.shape[3],
        batch_stats=state.batch_stats,
        extra={"precision": "bf16" if args.bf16 else "f32"})

    from ..eval.plots import draw_curve
    if history:
        draw_curve(
            {"training": [h.train.get("acc", 0) * 100 for h in history],
             "testing": [h.valid.get("acc", 0) * 100 for h in history]},
            "accuracy", os.path.join(args.out_dir, "train_acc.jpg"))
    log.info("done")
    return state, history


if __name__ == "__main__":
    main()
