"""Jitted train/eval steps: joint backbone training and triplet-head training.

The reference's training loop (train_efm.py:206-294, call stack SURVEY.md
§3.1) interleaves a device forward with host-side negative mining (one
device->host sync per draw) and a per-row cosine CSV loop. Here the entire
step — forward, in-batch mining, joint loss, backward, optimizer update, and
the cosine pos/neg similarity metrics — is ONE compiled XLA program; the CSV
sink consumes the returned per-row arrays asynchronously on the host.

Batch format: ``(anchor, positive, labels)`` with matching leading dim B
(the reference's DataIter concatenates them into one ``[anc|pos]`` tensor,
train_efm.py:87-110; here they stay separate so each shards cleanly over the
data axis, and the step concatenates locally for one fused forward pass).

Data parallelism: the same step function runs under ``jax.shard_map`` over a
1-D ``data`` mesh. Gradients/metrics are ``pmean``-ed over ICI (replacing
MXNet KVStore 'local', SURVEY.md §5.8) and the negative-mining candidate pool
is the *global* batch via ``all_gather`` — strictly richer than the
reference's single-device pool, and identical math to a single chip running
the global batch (verified in tests/test_train_steps.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..losses.triplet import joint_id_triplet_loss, triplet_loss
from ..ops.distances import l2_normalize, pairwise_sq_l2, rowwise_cosine
from ..ops import mining
from ..parallel.mesh import DATA_AXIS
from .state import TrainState

Metrics = dict[str, jnp.ndarray]

BACKBONE_METRIC_KEYS = ("loss", "id_loss", "tl_loss", "acc", "pos_cos", "neg_cos")
HEAD_METRIC_KEYS = ("loss", "pos_cos", "neg_cos")
_PER_ROW_METRICS = frozenset({"pos_cos", "neg_cos"})


def _as_float_images(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 batches normalize on device (ImageRecordIter scale=1/255,
    train_efm.py:179) — the streaming loader ships uint8 to keep host RAM
    and host->device traffic at 1x. Traced once per dtype; float passes
    through untouched."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def _apply_model(model, params, batch_stats, x, *, train: bool, drop_key=None):
    """Apply a flax model with optional batch_stats collection / dropout rng."""
    variables = {"params": params}
    has_bn = bool(batch_stats)
    if has_bn:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": drop_key} if (train and drop_key is not None) else None
    if train and has_bn:
        out, mut = model.apply(variables, x, train=True, rngs=rngs,
                               mutable=["batch_stats"])
        return out, mut["batch_stats"]
    out = model.apply(variables, x, train=train, rngs=rngs)
    return out, batch_stats


def _step_keys(state: TrainState, axis_name: str | None):
    key = jax.random.fold_in(state.base_key, state.step)
    if axis_name is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    k_mine, k_drop = jax.random.split(key)
    return k_mine, k_drop


def _mine(
    mining_mode: str,
    k_mine: jax.Array,
    anc: jnp.ndarray,
    pos: jnp.ndarray,
    pool_feat: jnp.ndarray,
    anchor_labels: jnp.ndarray,
    pool_labels: jnp.ndarray,
    num_candidates: int | None,
) -> jnp.ndarray:
    """Pick one negative row of ``pool_feat`` per anchor; returns [B, D]."""
    if mining_mode == "random":
        idx = mining.mine_random_negative(
            k_mine, anchor_labels, pool_labels, num_candidates=num_candidates
        )
    else:
        anc_n = l2_normalize(anc)
        pool_n = l2_normalize(pool_feat)
        if mining_mode == "semi_hard_fused":
            # Pallas streaming kernel: the [B, N] distance matrix never
            # materializes in HBM (ops/pallas/triplet_kernel.py). Indices are
            # integers, so no gradient path exists through the kernel.
            from ..ops.pallas.triplet_kernel import semi_hard_mining_pallas

            pos_sq = jnp.sum(jnp.square(anc_n - l2_normalize(pos)), axis=-1)
            b, n = anc_n.shape[0], pool_n.shape[0]
            tile_b = max(g for g in (256, 128, 64, 32, 16, 8, 4, 2, 1)
                         if b % g == 0)
            tile_n = max(g for g in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1)
                         if n % g == 0)
            idx = semi_hard_mining_pallas(
                jax.lax.stop_gradient(anc_n),
                jax.lax.stop_gradient(pos_sq),
                anchor_labels,
                jax.lax.stop_gradient(pool_n),
                pool_labels, tile_b=tile_b, tile_n=tile_n)
        else:
            sq = pairwise_sq_l2(anc_n, pool_n)
            pos_sq = jnp.sum(jnp.square(anc_n - l2_normalize(pos)), axis=-1)
            if mining_mode == "semi_hard":
                idx = mining.mine_semi_hard_negative(sq, pos_sq,
                                                     anchor_labels,
                                                     pool_labels)
            elif mining_mode == "hard":
                idx = mining.mine_hard_negative(sq, anchor_labels,
                                                pool_labels)
            else:
                raise ValueError(f"unknown mining mode {mining_mode!r}")
    return mining.gather_rows(pool_feat, idx)


def _pool(anc, pos, labels, axis_name):
    """Mining candidate pool: local [anc|pos] rows, or the global batch."""
    pool_feat = jnp.concatenate([anc, pos], axis=0)
    pool_labels = jnp.concatenate([labels, labels], axis=0)
    if axis_name is not None:
        pool_feat = jax.lax.all_gather(pool_feat, axis_name, axis=0, tiled=True)
        pool_labels = jax.lax.all_gather(pool_labels, axis_name, axis=0,
                                         tiled=True)
    return pool_feat, pool_labels


def _pmean_metrics(metrics: Metrics, axis_name: str | None) -> Metrics:
    if axis_name is None:
        return metrics
    return {
        k: (jax.lax.pmean(v, axis_name) if v.ndim == 0 else v)
        for k, v in metrics.items()
    }


def make_backbone_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    margin: float = 0.2,
    alpha: float = 0.1,
    mining_mode: str = "random",
    axis_name: str | None = None,
    mine_anchor_half_only: bool = False,
    center_weight: float = 0.0,
    center_alfa: float = 0.95,
    mirror_augment: bool = False,
    crop_size: int | None = None,
    class_axis_name: str | None = None,
    bwd_im2col: bool = False,
    remat_policy: str | None = None,
) -> Callable[..., tuple[TrainState, Metrics]]:
    """Joint id-softmax + triplet step (train_efm.py:229-245 semantics).

    ``bwd_im2col`` routes every stride-1 SAME conv through
    ``ops.conv_backward.conv2d_fg_im2col`` — the filter gradient becomes
    an explicit im2col matmul (the round-4 backward-MFU counter-
    experiment; numerically identical, tests/test_train_steps.py).

    ``remat_policy`` wraps the model apply in ``jax.checkpoint``: the
    round-4 trace decomposition measured 57% of the B=256 step in
    bandwidth-bound elementwise passes already AT the HBM peak, so the
    remaining lever is BYTES, not FLOPs — remat trades re-reading stored
    residuals (MFM outputs + select masks) for recomputing them from the
    saved conv outputs in the backward. ``"dots"`` saves only
    matmul/conv results (jax.checkpoint_policies.dots_saveable);
    ``"full"`` saves nothing. Numerically identical either way (pinned in
    tests/test_train_steps.py).

    ``mine_anchor_half_only`` reproduces the reference's train-time candidate
    restriction to the anchor half (train_efm.py:235); default mines over the
    whole (globally gathered) batch.

    ``center_weight > 0`` adds center loss (reference facenet.py:64-77) on
    the anchor embeddings; the centers table must be provided as
    ``state.aux`` ([num_classes, feature_dim] zeros to start) and is updated
    every step.

    ``mirror_augment`` applies per-row random horizontal mirroring INSIDE
    the jitted step (ImageRecordIter rand_mirror fused on device instead of
    the reference's 14 host preprocess threads, train_efm.py:179).

    ``crop_size`` enables rand_crop parity (train_efm.py:179): batches are
    packed LARGER than the model input (e.g. 144) and each row takes an
    independent random crop to ``crop_size`` on device every step. Requires
    ``mirror_augment``-style device augmentation (the crop runs in the same
    fused augment).

    ``class_axis_name`` enables class-parallel softmax (losses/sharded.py):
    the model must be built with the LOCAL class count (C / mesh model size)
    and the fc2 params sharded over that mesh axis (see
    ``infer_class_parallel_specs`` + ``shard_map_step_2d``). ``labels``
    remain GLOBAL ids.
    """
    if class_axis_name is not None and center_weight > 0.0:
        raise ValueError("center loss is not supported with class-parallel "
                         "softmax (centers table is class-indexed)")

    def step(state: TrainState, anchor: jnp.ndarray, positive: jnp.ndarray,
             labels: jnp.ndarray):
        b = anchor.shape[0]
        k_mine, k_drop = _step_keys(state, axis_name)
        labels = labels.astype(jnp.int32)
        images = _as_float_images(jnp.concatenate([anchor, positive], axis=0))
        if mirror_augment or crop_size is not None:
            from ..data.records import augment_batch

            images = augment_batch(jax.random.fold_in(k_drop, 7), images,
                                   mirror=mirror_augment,
                                   crop_size=crop_size)
        labels2 = jnp.concatenate([labels, labels], axis=0)

        def loss_fn(params):
            import contextlib

            if bwd_im2col:
                import flax.linen as fnn

                from ..ops.conv_backward import conv_interceptor_im2col_bwd

                ctx = fnn.intercept_methods(conv_interceptor_im2col_bwd())
            else:
                ctx = contextlib.nullcontext()
            def apply_fn(params, images):
                with ctx:
                    return _apply_model(
                        model, params, state.batch_stats, images,
                        train=True, drop_key=k_drop)

            if remat_policy is not None:
                policies = {
                    "full": None,
                    "dots": jax.checkpoint_policies.dots_saveable,
                }
                apply_fn = jax.checkpoint(
                    apply_fn, policy=policies[remat_policy])
            (logits, feat), new_bs = apply_fn(params, images)
            anc, pos = feat[:b], feat[b:]
            pool_feat, pool_labels = _pool(anc, pos, labels, axis_name)
            num_cand = b if (mine_anchor_half_only and axis_name is None) else None
            neg = _mine(mining_mode, k_mine, anc, pos, pool_feat, labels,
                        pool_labels, num_cand)
            if class_axis_name is not None:
                from ..losses.sharded import (class_parallel_argmax,
                                              class_parallel_softmax_ce)
                from ..losses.triplet import triplet_loss as _tl

                id_loss = class_parallel_softmax_ce(logits[:b], labels,
                                                    class_axis_name)
                tl = _tl(anc, pos, neg, margin=margin, normalize=True)
                total = id_loss + alpha * tl
                pred = class_parallel_argmax(logits, class_axis_name)
            else:
                total, id_loss, tl = joint_id_triplet_loss(
                    logits[:b], labels, anc, pos, neg,
                    margin=margin, alpha=alpha, normalize_embeddings=True)
                pred = jnp.argmax(logits, -1)
            new_centers = state.aux
            if center_weight > 0.0:
                from ..losses.center import center_loss

                c_loss, new_centers = center_loss(anc, labels, state.aux,
                                                  alfa=center_alfa)
                total = total + center_weight * c_loss
            acc = jnp.mean((pred == labels2).astype(jnp.float32))
            metrics = {
                "loss": total, "id_loss": id_loss, "tl_loss": tl, "acc": acc,
                "pos_cos": rowwise_cosine(anc, pos),
                "neg_cos": rowwise_cosine(anc, neg),
            }
            return total, (new_bs, new_centers, metrics)

        grads, (new_bs, new_centers, metrics) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            if class_axis_name is not None:
                # the 2-D path runs under shard_map(check_vma=True), where
                # the pbroadcast transpose has ALREADY psum-ed grads of
                # replicated params over the data axis (verified in
                # tests/test_class_parallel.py) — divide for the mean
                # instead of pmean-ing a second time
                n_data = jax.lax.psum(1, axis_name)
                grads = jax.tree_util.tree_map(lambda g: g / n_data, grads)
            else:
                grads = jax.lax.pmean(grads, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
            if center_weight > 0.0:
                new_centers = jax.lax.pmean(new_centers, axis_name)
        metrics = _pmean_metrics(metrics, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt, batch_stats=new_bs,
            step=state.step + 1, aux=new_centers)
        return new_state, metrics

    return step


def make_backbone_eval_step(
    model,
    *,
    margin: float = 0.2,
    alpha: float = 0.1,
    mining_mode: str = "random",
    axis_name: str | None = None,
    crop_size: int | None = None,
    class_axis_name: str | None = None,
) -> Callable[..., Metrics]:
    """Validation step (train_efm.py:260-280): same losses, no grad, negatives
    drawn from the full anchor+positive batch. With ``crop_size`` (rand_crop
    recipe), eval takes the deterministic CENTER crop — the RecordIter
    val-iter convention for a larger record."""

    def step(state: TrainState, anchor: jnp.ndarray, positive: jnp.ndarray,
             labels: jnp.ndarray):
        b = anchor.shape[0]
        k_mine, _ = _step_keys(state, axis_name)
        labels = labels.astype(jnp.int32)
        images = _as_float_images(jnp.concatenate([anchor, positive], axis=0))
        if crop_size is not None and crop_size < images.shape[1]:
            y0 = (images.shape[1] - crop_size) // 2
            x0 = (images.shape[2] - crop_size) // 2
            images = images[:, y0:y0 + crop_size, x0:x0 + crop_size, :]
        labels2 = jnp.concatenate([labels, labels], axis=0)
        (logits, feat), _ = _apply_model(
            model, state.params, state.batch_stats, images, train=False)
        anc, pos = feat[:b], feat[b:]
        pool_feat, pool_labels = _pool(anc, pos, labels, axis_name)
        neg = _mine(mining_mode, k_mine, anc, pos, pool_feat, labels,
                    pool_labels, None)
        if class_axis_name is not None:
            from ..losses.sharded import (class_parallel_argmax,
                                          class_parallel_softmax_ce)
            from ..losses.triplet import triplet_loss as _tl

            id_loss = class_parallel_softmax_ce(logits[:b], labels,
                                                class_axis_name)
            tl = _tl(anc, pos, neg, margin=margin, normalize=True)
            total = id_loss + alpha * tl
            pred = class_parallel_argmax(logits, class_axis_name)
        else:
            total, id_loss, tl = joint_id_triplet_loss(
                logits[:b], labels, anc, pos, neg,
                margin=margin, alpha=alpha, normalize_embeddings=True)
            pred = jnp.argmax(logits, -1)
        acc = jnp.mean((pred == labels2).astype(jnp.float32))
        metrics = {
            "loss": total, "id_loss": id_loss, "tl_loss": tl, "acc": acc,
            "pos_cos": rowwise_cosine(anc, pos),
            "neg_cos": rowwise_cosine(anc, neg),
        }
        return _pmean_metrics(metrics, axis_name)

    return step


def make_head_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    margin: float = 0.5,
    mining_mode: str = "random",
    axis_name: str | None = None,
    normalize_inputs: bool = False,
    normalize_embeddings: bool = False,
) -> Callable[..., tuple[TrainState, Metrics]]:
    """Triplet-only head step (pre-trained_efm_v3.py:193-212 semantics):
    a linear head over precomputed features, margin 0.5, SGD.

    ``normalize_embeddings`` applies the triplet loss on L2-normalized head
    outputs (FaceNet-style). The reference trains on raw outputs, which the
    loss can satisfy by scale inflation instead of structure — keep False
    for strict parity, True for better generalization.
    """

    def step(state: TrainState, anchor: jnp.ndarray, positive: jnp.ndarray,
             labels: jnp.ndarray):
        k_mine, _ = _step_keys(state, axis_name)
        labels = labels.astype(jnp.int32)
        if normalize_inputs:
            anchor = l2_normalize(anchor)
            positive = l2_normalize(positive)
        feats = jnp.concatenate([anchor, positive], axis=0)
        b = anchor.shape[0]

        def loss_fn(params):
            emb, _ = _apply_model(model, params, {}, feats, train=True)
            anc, pos = emb[:b], emb[b:]
            pool_feat, pool_labels = _pool(anc, pos, labels, axis_name)
            neg = _mine(mining_mode, k_mine, anc, pos, pool_feat, labels,
                        pool_labels, None)
            tl = triplet_loss(anc, pos, neg, margin=margin,
                              normalize=normalize_embeddings)
            metrics = {
                "loss": tl,
                "pos_cos": rowwise_cosine(anc, pos),
                "neg_cos": rowwise_cosine(anc, neg),
            }
            return tl, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        metrics = _pmean_metrics(metrics, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  step=state.step + 1)
        return new_state, metrics

    return step


def make_head_eval_step(
    model,
    *,
    margin: float = 0.5,
    mining_mode: str = "random",
    axis_name: str | None = None,
    normalize_inputs: bool = False,
):
    """Head validation (pre-trained_efm_v3.py:225-242). Also covers the
    no-training cosine-distance measurement of test_efm_v2.py:146-184 when
    ``model`` is an identity head and ``normalize_inputs=True``."""

    def step(state: TrainState, anchor: jnp.ndarray, positive: jnp.ndarray,
             labels: jnp.ndarray):
        k_mine, _ = _step_keys(state, axis_name)
        labels = labels.astype(jnp.int32)
        if normalize_inputs:
            anchor = l2_normalize(anchor)
            positive = l2_normalize(positive)
        feats = jnp.concatenate([anchor, positive], axis=0)
        b = anchor.shape[0]
        emb, _ = _apply_model(model, state.params, {}, feats, train=False)
        anc, pos = emb[:b], emb[b:]
        pool_feat, pool_labels = _pool(anc, pos, labels, axis_name)
        neg = _mine(mining_mode, k_mine, anc, pos, pool_feat, labels,
                    pool_labels, None)
        tl = triplet_loss(anc, pos, neg, margin=margin)
        metrics = {
            "loss": tl,
            "pos_cos": rowwise_cosine(anc, pos),
            "neg_cos": rowwise_cosine(anc, neg),
        }
        return _pmean_metrics(metrics, axis_name)

    return step


def make_scanned_step(step_fn) -> Callable:
    """Chain K train steps into ONE device program via ``lax.scan``.

    On link-attached setups (this repo's tunneled chip) a per-step Python
    dispatch loop round-trips the full train state through the link every
    step — measured 535 ms/step against a 66 ms on-device compute floor
    (LightCNN9, B=256). Scanning K steps per dispatch keeps the state in
    HBM; the host loop only ships the K stacked batches.

    Takes the UNjitted per-batch step; returns a jitted
    ``fn(state, anchors [K, B, ...], positives [K, B, ...], labels [K, B])
    -> (state, metrics)`` where each metrics leaf is stacked with a leading
    K dim. Per-step PRNG keys still derive from ``state.step``, so the
    update sequence is IDENTICAL to K separate calls (tested).
    """

    @jax.jit
    def scanned(state, anchors, positives, labels):
        def body(st, xl):
            st, m = step_fn(st, *xl)
            return st, m

        return jax.lax.scan(body, state, (anchors, positives, labels))

    return scanned


def shard_map_scanned_step(
    step_fn,
    mesh,
    *,
    metric_keys=BACKBONE_METRIC_KEYS,
    axis_name: str = DATA_AXIS,
):
    """Data parallelism COMPOSED with scan chunking: the lax.scan over K
    stacked batches runs inside shard_map, so each dispatch advances K
    steps with the state resident in HBM AND the batch dim (axis 1 of the
    [K, B, ...] inputs) sharded over ICI. ``step_fn`` must have been built
    with ``axis_name``; metrics come back stacked [K] (scalars, pmean'd
    in-step) / [K, B] (per-row, batch-sharded)."""

    def scanned(state, anchors, positives, labels):
        def body(st, xl):
            st, m = step_fn(st, *xl)
            return st, m

        return jax.lax.scan(body, state, (anchors, positives, labels))

    mspec = {
        k: (P(None, axis_name) if k in _PER_ROW_METRICS else P())
        for k in metric_keys
    }
    return jax.jit(jax.shard_map(
        scanned,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, axis_name),
                  P(None, axis_name)),
        out_specs=(P(), mspec),
        check_vma=True,
    ))


def shard_map_scanned_step_2d(
    step_fn,
    mesh,
    state_specs,
    *,
    metric_keys=BACKBONE_METRIC_KEYS,
    data_axis: str = DATA_AXIS,
):
    """Scan chunking COMPOSED with the 2-D (data, model) class-parallel
    mesh: K steps per dispatch with the train state resident in HBM, the
    batch dim (axis 1 of the [K, B, ...] inputs) sharded over the data
    axis, and the classifier head + its optimizer mirrors sharded over the
    model axis per ``state_specs``. The scan carry keeps the state's
    shardings fixed across iterations. check_vma=True for the same
    gradient-scaling reason as ``shard_map_step_2d``; the Pallas fused
    miner composes (it declares vma on its out_shape)."""

    def scanned(state, anchors, positives, labels):
        def body(st, xl):
            st, m = step_fn(st, *xl)
            return st, m

        return jax.lax.scan(body, state, (anchors, positives, labels))

    mspec = {
        k: (P(None, data_axis) if k in _PER_ROW_METRICS else P())
        for k in metric_keys
    }
    return jax.jit(jax.shard_map(
        scanned,
        mesh=mesh,
        in_specs=(state_specs, P(None, data_axis), P(None, data_axis),
                  P(None, data_axis)),
        out_specs=(state_specs, mspec),
        check_vma=True,
    ))


def infer_class_parallel_specs(state: TrainState, num_classes: int,
                               model_axis: str):
    """PartitionSpec tree for class-parallel training: any leaf whose tree
    path goes through the classifier head (``fc2``) and whose trailing dim
    is ``num_classes`` shards over ``model_axis`` (covers params AND their
    optimizer-state mirrors — optax keeps the params' dict structure);
    everything else replicates. Path-gating prevents accidental sharding of
    unrelated tensors whose last dim happens to equal ``num_classes``."""
    import re

    def spec(path, leaf):
        keys = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        if (re.search(r"(^|/)fc2(/|$)", keys)
                and hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[-1] == num_classes):
            return P(*([None] * (leaf.ndim - 1)), model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_map_step_2d(
    step_fn,
    mesh,
    state_specs,
    *,
    has_state_out: bool,
    metric_keys=BACKBONE_METRIC_KEYS,
    data_axis: str = DATA_AXIS,
):
    """Compile a step over a 2-D (data, model) mesh: batch sharded over the
    data axis, classifier head sharded over the model axis per
    ``state_specs`` (see ``infer_class_parallel_specs``), everything else
    replicated. The step must have been built with
    ``axis_name=data_axis`` and ``class_axis_name=<model axis>`` and with a
    model whose ``num_classes`` is the LOCAL class count."""
    mspec = {
        k: (P(data_axis) if k in _PER_ROW_METRICS else P())
        for k in metric_keys
    }
    out_specs = (state_specs, mspec) if has_state_out else mspec
    # check_vma=True is REQUIRED here: with it off, the replicated loss
    # output's cotangent is claimed once per model shard and the psum
    # transpose multiplies every gradient by the model-axis size (verified
    # in tests). The Pallas fused-mining kernel composes since it declares
    # the vma union on its out_shape (ops/pallas/triplet_kernel.py).
    return jax.jit(jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(state_specs, P(data_axis), P(data_axis), P(data_axis)),
        out_specs=out_specs,
        check_vma=True,
    ))


def shard_map_step(
    step_fn,
    mesh,
    *,
    has_state_out: bool,
    metric_keys=BACKBONE_METRIC_KEYS,
    axis_name: str = DATA_AXIS,
):
    """Compile a step over a data mesh: state replicated, batch sharded.

    ``step_fn`` must have been built with the same ``axis_name``. Scalar
    metrics are pmean-ed inside the step (replicated out-spec); per-row
    metric arrays (pos_cos/neg_cos) come back sharded over the batch axis.
    """
    mspec = {
        k: (P(axis_name) if k in _PER_ROW_METRICS else P())
        for k in metric_keys
    }
    out_specs = (P(), mspec) if has_state_out else mspec
    # check_vma=True: the fused Pallas miner now declares the vma union
    # on its out_shape (ops/pallas/triplet_kernel.py), so every step —
    # including semi_hard_fused — gets shard_map's full sharding checks
    # (the round-4 global check_vma=False workaround is gone, VERDICT r4
    # item 4).
    return jax.jit(jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=out_specs,
        check_vma=True,
    ))
